from .diffuser import (
    CORRECTORS,
    PREDICTORS,
    Diffuser,
    euler_maruyama_predictor,
    gibbs_corrector,
    langevin_corrector,
    register_corrector,
    register_predictor,
)

__all__ = [
    "Diffuser",
    "PREDICTORS",
    "CORRECTORS",
    "register_predictor",
    "register_corrector",
    "euler_maruyama_predictor",
    "langevin_corrector",
    "gibbs_corrector",
]
