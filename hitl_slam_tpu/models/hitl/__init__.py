"""Human-in-the-Loop map repair — the flagship model family."""

from .engine import CycleReport, HitLSLAM  # noqa: F401
