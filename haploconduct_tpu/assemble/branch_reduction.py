"""POLYTE's read-evidence branch reduction (src/BranchReduction.cpp).

Full implementation lands with the POLYTE workflow; this module currently
exposes the entry point used by the iteration driver.
"""

from __future__ import annotations

from ..graph.overlap_graph import OverlapGraph
from ..io.subreads import SubreadDict


def read_based_branch_reduction(graph: OverlapGraph, originals_dict: SubreadDict) -> None:
    raise NotImplementedError(
        "branch_reduction is part of the POLYTE workflow (pending); "
        "run with branch_reduction=False"
    )
