"""Model families: the NBMF estimator API."""

from .estimator import NBMF, NBMFMM

__all__ = ["NBMF", "NBMFMM"]
