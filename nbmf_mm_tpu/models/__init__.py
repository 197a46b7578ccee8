"""Model families: the NBMF estimator plus the paper's comparison baselines."""

from .baselines import LogisticPCA, NBMFEM
from .estimator import NBMF, NBMFMM
from .serving import FoldInServer

__all__ = ["NBMF", "NBMFMM", "NBMFEM", "LogisticPCA", "FoldInServer"]
