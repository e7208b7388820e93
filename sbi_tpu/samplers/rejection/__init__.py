from .rejection import accept_reject_sample, rejection_sample

__all__ = ["rejection_sample", "accept_reject_sample"]
