"""FMPE: flow-matching posterior estimation (ref `sbi/inference/trainers/
vfpe/fmpe.py:174`; default net 'mlp')."""

from __future__ import annotations

from ....neural_nets.factory import posterior_flow_nn
from .base_vf_inference import VectorFieldTrainer


class FMPE(VectorFieldTrainer):
    def _default_builder(self, model: str):
        return posterior_flow_nn(model=model)
