"""Driver-side collect budget guard for the trainers.

``pq_train`` / ``opq_train`` / ``kmeans_fit`` legitimately collect a small
sample or seed set to the driver (PQ/OPQ are standardly sample-trained;
the codebook IS driver-sized). The hazard is the UNGUARDED product
``rows x dim``: ``opq_train(sample_size=20_000)`` on 1536-dim embeddings
is ~30M floats (fine), but the same call at 4096-dim x a larger sample is
gigabytes of Python Row objects collected silently. Same precedent as the
LSH banding validator (``dedup.minhash_lsh_pairs``): validate the
degenerate configuration loudly BEFORE running it, with a documented
override for callers on a driver provisioned for more.
"""

from __future__ import annotations

# ~50M float64 elements = 400 MB of vector payload (several times that as
# collected Row objects) — generous for any sane sample-train, far below
# anything that silently exhausts a normally-provisioned driver.
MAX_DRIVER_COLLECT_ELEMENTS = 50_000_000


def check_driver_collect_budget(
    n_rows: int,
    dim: int,
    what: str,
    max_elements: int | None = None,
) -> None:
    """Raise before a driver collect whose ``n_rows * dim`` element count
    exceeds the ceiling. ``max_elements`` is the documented override
    (``max_driver_elements=`` on the public trainers); ``None`` means the
    module default."""
    ceiling = (
        MAX_DRIVER_COLLECT_ELEMENTS if max_elements is None else int(max_elements)
    )
    elements = int(n_rows) * int(dim)
    if elements > ceiling:
        raise ValueError(
            f"{what}: refusing to collect {n_rows} rows x {dim} dims = "
            f"{elements:,} elements to the driver (ceiling {ceiling:,}). "
            "Lower the sample/seed size, or pass max_driver_elements= "
            "explicitly if the driver is provisioned for it."
        )
