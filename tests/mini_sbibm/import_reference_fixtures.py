"""Convert the reference's committed golden posterior fixtures
(`/root/reference/tests/mini_sbibm/files/{slcp,two_moons}/*.pt`, loader
contract `tests/mini_sbibm/base_task.py:78-100`) into .npz files used as the
*comparison set* for benchmark C2ST numbers.

These are data artifacts (posterior samples), not code. Run once:

    python tests/mini_sbibm/import_reference_fixtures.py
"""

import os

import numpy as np

REF_DIR = "/root/reference/tests/mini_sbibm/files"
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "files")
NUM_OBS = 10


def convert(task: str) -> None:
    import torch

    obs, thetas, samples = [], [], []
    for i in range(1, NUM_OBS + 1):
        d = os.path.join(REF_DIR, task)
        obs.append(torch.load(f"{d}/x_o_{i}.pt", weights_only=True).numpy()[0])
        thetas.append(torch.load(f"{d}/theta_o_{i}.pt", weights_only=True).numpy()[0])
        samples.append(torch.load(f"{d}/samples_{i}.pt", weights_only=True).numpy())
    out = os.path.join(OUT_DIR, f"{task}_ref.npz")
    np.savez_compressed(
        out,
        observations=np.stack(obs).astype(np.float32),
        true_thetas=np.stack(thetas).astype(np.float32),
        reference_samples=np.stack(samples).astype(np.float32),
    )
    print(f"wrote {out}: obs {np.stack(obs).shape}, samples {np.stack(samples).shape}")


if __name__ == "__main__":
    for task in ("slcp", "two_moons"):
        convert(task)
