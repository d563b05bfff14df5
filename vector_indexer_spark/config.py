"""Engine configuration + the reference's sizing heuristics.

Heuristic formulas are part of observable behavior (bench nlist parity
— reference bench forces Faiss to the same nlist) and are kept
verbatim: F5-F9 in SURVEY.md §2.8.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

U64_MASK = (1 << 64) - 1

# Reference defaults (src/api.rs:8-43)
DEFAULT_K = 10
DEFAULT_N_PROBE = 20
MAX_K = 10_000
MAX_N_PROBE = 10_000
DEFAULT_SEED = 42

# k-means internals (src/kmeans.rs)
KMEANS_DELTA_TOL = 1e-4  # RMS centroid-movement convergence (kmeans.rs:22,71)
KMEANS_INIT_SAMPLE_CAP = 50_000  # k-means++ D² sample cap (kmeans.rs:158-163)
SUPER_KMEANS_ITERS = 100  # super-centroid training iters (ivf_index.rs:103-109)


def suggest_nlist(n: int) -> int:
    """F5 — nlist heuristic (src/utils.rs:9-16; duplicated in
    bindings/python/src/lib.rs:307-315).

    Intentional n=0 deviation: the reference returns 0 for n=0 (isqrt(0));
    we clamp to >=1 because a 0-cluster k-means is never a valid build and
    the Spark pipeline fails earlier on empty input anyway.
    """
    if n < 10_000:
        return max(1, int(math.isqrt(n)))
    if n < 100_000:
        return 2 * math.ceil(math.sqrt(n))
    return 4 * math.ceil(math.sqrt(n))


def calculate_max_iterations(n: int) -> int:
    """F6 — iteration-budget heuristic (src/utils.rs:18-26)."""
    if n < 10_000:
        return 300
    if n < 100_000:
        return 100
    if n < 1_000_000:
        return 50
    return 20


def mini_batch_size(n: int) -> int:
    """F7 — mini-batch size (src/kmeans.rs:83)."""
    return min(256, max(10, int(math.isqrt(n))))


def num_shards(nlist: int) -> int:
    """F8 — shard count = ceil(sqrt(nlist)) (src/ivf_index.rs:104)."""
    return max(1, math.ceil(math.sqrt(nlist)))


def super_centroid_seed(seed: int) -> int:
    """F9 — derived seed, wrapping u64 arithmetic (src/ivf_index.rs:106)."""
    return (seed * 31 + 7) & U64_MASK


def hierarchy_seed(seed: int) -> int:
    """F9 — derived seed for meta-centroid k-means (src/kmeans.rs:494)."""
    return (seed * 17 + 42) & U64_MASK


@dataclass
class IndexConfig:
    """Mirrors VectorIndexerConfig (src/api.rs:8-43)."""

    dimension: int
    index_dir: str
    default_k: int = DEFAULT_K
    default_n_probe: int = DEFAULT_N_PROBE
    max_k: int = MAX_K
    max_n_probe: int = MAX_N_PROBE
    seed: int = DEFAULT_SEED
    # Spark-only knobs
    extra_write_options: dict = field(default_factory=dict)

    def clamp_k(self, k: int | None) -> int:
        k = self.default_k if k is None else k
        if k <= 0:
            raise ValueError("k must be positive")  # P3 (ivf_index.rs:197-202)
        return min(k, self.max_k)  # P4 (api.rs:189-190)

    def clamp_n_probe(self, n_probe: int | None) -> int:
        n_probe = self.default_n_probe if n_probe is None else n_probe
        if n_probe <= 0:
            raise ValueError("n_probe must be positive")
        return min(n_probe, self.max_n_probe)
