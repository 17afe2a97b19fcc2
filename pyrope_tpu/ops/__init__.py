"""TPU compute ops: distance/score kernels, top-k, k-means, PQ, quantization.

This package is the TPU-native analog of the reference's SIMD kernel library
(ref: src/Pyrope.GarnetServer/Vector/VectorMath.cs) — per-row SIMD loops become
batched MXU matmuls with fused masking and top-k selection.
"""

from pyrope_tpu.ops.distance import score_matrix, score_convention
from pyrope_tpu.ops.topk import masked_topk, merge_topk

__all__ = ["score_matrix", "score_convention", "masked_topk", "merge_topk"]
