"""Residual vector quantization (Mimi's discrete bottleneck).

Behavioral parity with /root/reference/src/moshi/quantization/:
  * EuclideanCodebook (core_vq.h:27-85): decode = row gather; encode =
    nearest centroid.  The reference does a brute-force distance with an
    argmax of 1/(d^2+1) because GGML lacks argmin; on TPU we use the
    matmul form argmax(2 x.E^T - |E|^2) which lands the O(N*D) work on
    the MXU (SURVEY.md §7.3).  The embedding table is derived at load
    time as embedding_sum / clamp(cluster_usage, eps) (core_vq.h:58-85)
    — see runtime/loader.py.
  * ResidualVQ (core_vq.h:139-194): greedy residual chain.
  * SplitRVQ (vq.h:11-119): semantic rvq_first (n_q=1) + acoustic
    rvq_rest (n_q-1), each with 1x1 input/output projections; decode
    sums both branches.

Codebooks of a chain are stacked [n_q, N, D] and scanned.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from moshi_tpu.nn.layers import linear


def codebook_decode(embedding: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """embedding [N, D], codes [...] -> [..., D]."""
    return jnp.take(embedding, codes, axis=0)


def codebook_encode(embedding: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest centroid ids for x [..., D] (argmin ||x - e||^2 =
    argmax 2 x.e - |e|^2; the |x|^2 term is constant per query)."""
    e = embedding.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    scores = 2.0 * jnp.einsum("...d,nd->...n", xf, e) - jnp.sum(e * e, axis=-1)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def rvq_encode(embeddings: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """embeddings [n_q, N, D], x [B, T, D] -> codes [B, T, n_q]."""
    def body(residual, emb):
        idx = codebook_encode(emb, residual)
        quantized = codebook_decode(emb, idx)
        return residual - quantized.astype(residual.dtype), idx
    _, codes = jax.lax.scan(body, x, embeddings)
    return jnp.moveaxis(codes, 0, -1)


def rvq_decode(embeddings: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """embeddings [n_q, N, D], codes [B, T, n_q] -> [B, T, D]."""
    def body(acc, inp):
        emb, idx = inp
        return acc + codebook_decode(emb, idx), None
    init = jnp.zeros(codes.shape[:-1] + (embeddings.shape[-1],), jnp.float32)
    out, _ = jax.lax.scan(body, init, (embeddings, jnp.moveaxis(codes, -1, 0)))
    return out


@dataclass(frozen=True)
class SplitRVQConfig:
    n_q: int                 # total codebooks
    n_q_semantic: int = 1
    dim: int = 512           # outer dim (SEANet/transformer side)
    codebook_dim: int = 256
    codebook_size: int = 2048


class SplitRVQ:
    """params = {
        rvq_first:  {embeddings [1, N, Dc], input_proj, output_proj},
        rvq_rest:   {embeddings [n_q-1, N, Dc], input_proj, output_proj},
    }; projections are 1x1 convs stored as linear weights [out, in]."""

    def __init__(self, cfg: SplitRVQConfig):
        self.cfg = cfg

    def init_params(self, key, dtype=jnp.float32):
        c = self.cfg
        ks = jax.random.split(key, 6)

        def branch(k0, k1, k2, n):
            return {
                "embeddings": jax.random.normal(
                    k0, (n, c.codebook_size, c.codebook_dim), dtype),
                "input_proj": {"weight": jax.random.normal(
                    k1, (c.codebook_dim, c.dim), dtype) * c.dim ** -0.5},
                "output_proj": {"weight": jax.random.normal(
                    k2, (c.dim, c.codebook_dim), dtype) * c.codebook_dim ** -0.5},
            }
        return {
            "rvq_first": branch(ks[0], ks[1], ks[2], c.n_q_semantic),
            "rvq_rest": branch(ks[3], ks[4], ks[5], c.n_q - c.n_q_semantic),
        }

    def encode(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """x [B, T, dim] -> codes [B, T, n_q] (semantic first)."""
        first = params["rvq_first"]
        rest = params["rvq_rest"]
        xs = linear(first["input_proj"], x)
        codes_first = rvq_encode(first["embeddings"], xs)
        xa = linear(rest["input_proj"], x)
        codes_rest = rvq_encode(rest["embeddings"], xa)
        return jnp.concatenate([codes_first, codes_rest], axis=-1)

    def decode(self, params, codes: jnp.ndarray) -> jnp.ndarray:
        """codes [B, T, n_q] -> [B, T, dim]."""
        c = self.cfg
        first = params["rvq_first"]
        rest = params["rvq_rest"]
        n_rest = codes.shape[-1] - c.n_q_semantic  # runtime n_q may be lower
        qs = rvq_decode(first["embeddings"], codes[..., : c.n_q_semantic])
        qa = rvq_decode(rest["embeddings"][:n_rest], codes[..., c.n_q_semantic:])
        out = linear(first["output_proj"], qs.astype(jnp.float32))
        out = out + linear(rest["output_proj"], qa.astype(jnp.float32))
        return out
