"""Operator package.  Also home of the bounded-model-state contract
guard shared by every driver-loop collect (r11 verdict item 3).

The "k-means contract": an engine path may collect MODEL state to the
driver (centroids, codebooks, type×type edge relations, MMR pools) but
never CORPUS-scale data.  Every such collect is bounded by construction
— k·dim centroids, |event types|² edges, pool_n² pair sims — but until
r12 only PCA asserted its bound at runtime.  :func:`check_model_state`
makes the contract enforceable instead of documentary: a relation that
outgrows the bound fails LOUDLY with the operator named, instead of
silently dragging an unbounded collect through the driver heap.
"""

from __future__ import annotations

# Scalar-cell ceiling for driver-side model state: 2^22 cells ≈ 32 MiB of
# BIGINTs — generous for any legitimate model (64-dim k=8 centroids: 512
# cells; a 1000-type event graph: ≤ 1e6 edge cells) while catching a
# schema drift that turns a "bounded by event-type cardinality" relation
# into a per-user or per-document one (the failure mode the guard exists
# for: the bound is guaranteed by the SCHEMA, and schemas change).
MODEL_STATE_MAX_CELLS = 4_194_304


def check_model_state(n_cells: int, what: str, limit: int = MODEL_STATE_MAX_CELLS) -> None:
    """Loud-failure guard for a driver-side model-state collect.

    ``n_cells``: scalar cells about to be held on the driver (rows ×
    columns, or len(rows) for 1-wide).  Raises ValueError naming the
    operator — the PCA-overflow-guard precedent (similarity.py) applied
    to every driver loop."""
    if n_cells > limit:
        raise ValueError(
            f"bounded-model-state contract violated in {what}: {n_cells} "
            f"cells exceed the {limit}-cell driver ceiling — this relation "
            "is supposed to be model-sized (k-means contract); a corpus-"
            "scale collect indicates schema drift or a miswired input"
        )
