"""Product quantization: codebook training, encoding, ADC tables.

Rebuild of the reference's ``ProductQuantizer``
(ref: src/Pyrope.GarnetServer/Vector/ProductQuantizer.cs): codebooks
[m][k][subDim], requires dim % m == 0 and k ≤ 256 (:16-26); per-subspace
k-means with L2, 10 iterations, seed 42+m (:28-58); nearest-sub-centroid
encode (:60-80); decode (:82-96); per-query L2² distance table (:98-120).

On TPU: training reuses the blocked k-means matmul, encoding is an [N, ksub]
score matmul per subspace, and the ADC table is one einsum
[B, M, sub] × [M, ksub, sub] -> [B, M, ksub].
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pyrope_tpu.ops.kmeans import kmeans_assign, kmeans_train
from pyrope_tpu.types import Metric


@dataclasses.dataclass
class ProductQuantizer:
    m: int                    # number of subspaces
    ksub: int                 # codes per subspace (≤ 256)
    dim: int
    codebooks: np.ndarray | None = None  # [m, ksub, sub]

    def __post_init__(self):
        if self.dim % self.m != 0:
            raise ValueError(f"dim {self.dim} not divisible by m {self.m}")
        if self.ksub > 256:
            raise ValueError("ksub must be <= 256 (uint8 codes)")
        self.sub = self.dim // self.m

    @property
    def trained(self) -> bool:
        return self.codebooks is not None

    def train(self, data: np.ndarray, *, seed: int = 42, iters: int = 10) -> None:
        """Per-subspace k-means on L2, seed 42+m (ref :28-58)."""
        data = np.asarray(data, np.float32)
        n = data.shape[0]
        ks = min(self.ksub, n)
        cbs = np.zeros((self.m, self.ksub, self.sub), np.float32)
        for mi in range(self.m):
            subdata = np.ascontiguousarray(data[:, mi * self.sub : (mi + 1) * self.sub])
            # sub-quantizers resolve fine residual structure: train in exact
            # fp32 (coarse IVF training uses the faster bf16 default)
            c = kmeans_train(subdata, ks, Metric.L2, seed=seed + mi, iters=iters,
                             compute_dtype=None)
            cbs[mi, : c.shape[0]] = c
            if c.shape[0] < self.ksub:
                # duplicate last centroid so unused codes stay harmless
                cbs[mi, c.shape[0] :] = c[-1]
        self.codebooks = cbs

    def encode(self, data: np.ndarray) -> np.ndarray:
        """[N, D] -> uint8 codes [N, m] (nearest sub-centroid, ref :60-80)."""
        assert self.codebooks is not None
        data = np.asarray(data, np.float32)
        codes = np.empty((data.shape[0], self.m), np.uint8)
        for mi in range(self.m):
            subdata = np.ascontiguousarray(data[:, mi * self.sub : (mi + 1) * self.sub])
            codes[:, mi] = kmeans_assign(subdata, self.codebooks[mi], Metric.L2).astype(np.uint8)
        return codes

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """uint8 codes [N, m] -> reconstruction [N, D] (ref :82-96)."""
        assert self.codebooks is not None
        codes = np.asarray(codes)
        out = np.empty((codes.shape[0], self.dim), np.float32)
        for mi in range(self.m):
            out[:, mi * self.sub : (mi + 1) * self.sub] = self.codebooks[mi][codes[:, mi]]
        return out

    def state(self) -> dict:
        return {
            "m": self.m,
            "ksub": self.ksub,
            "dim": self.dim,
            "codebooks": self.codebooks,
        }

    @classmethod
    def from_state(cls, st: dict) -> "ProductQuantizer":
        pq = cls(m=int(st["m"]), ksub=int(st["ksub"]), dim=int(st["dim"]))
        cb = st.get("codebooks")
        pq.codebooks = None if cb is None or np.size(cb) == 0 else np.asarray(cb, np.float32)
        return pq


def adc_l2_table(q: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Per-query L2² lookup tables (ref: ComputeDistanceTable :98-120).

    q: [B, D] (already residual for IVF-PQ), codebooks: [M, ksub, sub].
    Returns [B, M, ksub] where table[b, m, k] = ‖q_sub(b, m) − cb[m, k]‖².
    """
    b, d = q.shape
    m, ksub, sub = codebooks.shape
    qs = q.reshape(b, m, sub)
    dots = jnp.einsum(
        "bms,mks->bmk", qs, codebooks, preferred_element_type=jnp.float32
    )
    qq = jnp.sum(qs * qs, axis=-1)                    # [B, M]
    cc = jnp.sum(codebooks * codebooks, axis=-1)      # [M, ksub]
    return qq[:, :, None] - 2.0 * dots + cc[None, :, :]


def adc_ip_table(q: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Per-query dot-product lookup tables: table[b, m, k] = q_sub·cb[m, k]."""
    b, d = q.shape
    m, ksub, sub = codebooks.shape
    qs = q.reshape(b, m, sub)
    return jnp.einsum("bms,mks->bmk", qs, codebooks, preferred_element_type=jnp.float32)


def adc_accumulate(table: jax.Array, codes: jax.Array, *, impl: str = "onehot") -> jax.Array:
    """Sum table entries selected by codes.

    table: [B, M, ksub] fp32; codes: [B, L, M] int32/uint8.
    Returns [B, L] = Σ_m table[b, m, codes[b, l, m]]
    (ref: IvfPqVectorIndex.cs:182-198 ADC accumulation loop).

    impl='onehot' re-expresses the table lookup as a one-hot × table matmul
    per subspace — the classic TPU trick (PQTable / Quick-ADC lineage, see
    PAPERS.md): TPUs have no fast per-lane gather, but the [L, ksub] one-hot
    comparison is cheap VPU work and the contraction runs on the MXU.
    impl='gather' is the direct take_along_axis form.
    """
    b, m, ksub = table.shape
    if impl == "gather":
        tbl_flat = table.reshape(b, m * ksub)
        moff = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2) * ksub
        idx = codes.astype(jnp.int32) + moff          # [B, L, M]
        gathered = jnp.take_along_axis(tbl_flat, idx.reshape(b, -1), axis=1)
        return jnp.sum(gathered.reshape(b, -1, m), axis=-1)
    # one-hot matmul: acc[b, l] = Σ_m Σ_k 1[codes[b,l,m]=k] · table[b,m,k].
    # fp32 with HIGHEST precision keeps this bit-faithful to the gather
    # (one-hot rows select exactly one fp32 table entry).
    kiota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ksub), 2)  # [1,1,ksub]
    acc = None
    for mi in range(m):
        oh = (codes[:, :, mi].astype(jnp.int32)[:, :, None] == kiota).astype(
            jnp.float32
        )                                              # [B, L, ksub]
        part = jnp.einsum(
            "blk,bk->bl", oh, table[:, mi, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc = part if acc is None else acc + part
    return acc
