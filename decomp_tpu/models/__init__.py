"""Public solver families (SURVEY.md §1 layer L3'): lasso, NMF, dictionary
learning. Each module exposes a ``solve()`` mirroring the reference API
surface so parity tests map 1:1 (SURVEY.md §2a rows 2-4)."""

from decomp_tpu.models import dictionary_learning, lasso, nmf

__all__ = ["lasso", "nmf", "dictionary_learning"]
