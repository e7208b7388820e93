"""Extract and execute the python code blocks of the deep tutorials.

The deep walkthroughs under docs/tutorials/ are executable documentation:
`scripts/run_deep_tutorials.py` runs every block verbatim (full budgets,
generating the committed figures), and `tests/test_tutorials_deep.py` runs
the same blocks with budget-shrinking substitutions. Each substitution must
actually hit, so docs drift is a test failure, not a silent skip.
"""

from __future__ import annotations

import os
import re
import sys
import types
from typing import Dict, Optional, Sequence, Tuple

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TUTORIAL_DIR = os.path.join(REPO_ROOT, "docs", "tutorials")

DEEP_TUTORIALS = (
    "00_getting_started.md",
    "01_multiround_inference.md",
    "02_embedding_networks.md",
    "03_diagnostics_battery.md",
    "04_mcmc_and_potentials.md",
    "05_hodgkin_huxley.md",
    "06_scaling_tpu_mesh.md",
)


def extract_blocks(md_path: str) -> list:
    """All ```python fenced blocks of a markdown file, in order."""
    with open(md_path) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def run_tutorial(
    md_name: str,
    substitutions: Sequence[Tuple[str, str]] = (),
    namespace: Optional[Dict] = None,
) -> Dict:
    """Exec a tutorial's blocks as one program in a fresh namespace.

    `substitutions` are literal (old, new) string replacements applied to
    the joined source; every `old` must be present (drift guard).
    """
    md_path = os.path.join(TUTORIAL_DIR, md_name)
    blocks = extract_blocks(md_path)
    assert blocks, f"no python blocks in {md_path}"
    src = "\n\n".join(blocks)
    for old, new in substitutions:
        assert old in src, f"{md_name}: substitution target not found: {old!r}"
        src = src.replace(old, new)
    # Exec inside a real registered module: dataclass machinery (e.g. flax
    # modules defined in a tutorial) resolves string annotations through
    # sys.modules[cls.__module__], which must exist.
    mod_name = "tutorial_" + re.sub(r"\W", "_", md_name)
    mod = types.ModuleType(mod_name)
    sys.modules[mod_name] = mod
    ns = mod.__dict__
    if namespace is not None:
        ns.update(namespace)
    try:
        exec(compile(src, md_path, "exec"), ns)
        return dict(ns)
    finally:
        sys.modules.pop(mod_name, None)
