"""Streaming 1-D convolutions with explicit carry state.

Behavioral parity with /root/reference/src/moshi/modules/conv.h:
  * StreamingConv1d (conv.h:36-128): causal conv keeping a left-context
    carry of `K_eff - stride` input samples; zero-initialised state gives
    the implicit left zero-padding of the first frame.
  * StreamingConvTranspose1d (conv.h:193-319): overlap-add with a
    `K - stride` output tail carried between calls (`prev_y` in the
    reference); grouped/depthwise kernels supported via
    feature_group_count (the reference special-cases groups as
    per-channel multiplies, conv.h:258-279).
  * StatelessConv1d (conv.h:137-184): kernel <= stride, no carry.

TPU design: activations are [B, T, C] (NWC) so the channel contraction
lands on the MXU via lax.conv_general_dilated; state is a pytree threaded
through the jitted step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class StreamingConv1d:
    in_ch: int
    out_ch: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True

    @property
    def k_eff(self) -> int:
        return self.dilation * (self.kernel - 1) + 1

    @property
    def carry(self) -> int:
        return max(self.k_eff - self.stride, 0)

    def init_params(self, key, dtype=jnp.float32):
        scale = (self.in_ch // self.groups * self.kernel) ** -0.5
        p = {"weight": jax.random.normal(
            key, (self.out_ch, self.in_ch // self.groups, self.kernel), dtype) * scale}
        if self.bias:
            p["bias"] = jnp.zeros((self.out_ch,), dtype)
        return p

    def init_state(self, batch: int, dtype=jnp.float32):
        return {"prev": jnp.zeros((batch, self.carry, self.in_ch), dtype)}

    def apply_full(self, params, x):
        """Non-streaming causal conv over [B, T, C] (left zero-pad)."""
        b = x.shape[0]
        state = self.init_state(b, x.dtype)
        y, _ = self(params, state, x)
        return y

    def __call__(self, params, state, x):
        """x: [B, T, Cin] with T % stride == 0 (and T >= stride).
        Returns (y [B, T//stride, Cout], new_state)."""
        t_in = x.shape[1]
        assert t_in % self.stride == 0 and t_in >= self.stride, \
            f"conv stream step needs T % {self.stride} == 0, got {t_in}"
        full = jnp.concatenate([state["prev"].astype(x.dtype), x], axis=1)
        w = params["weight"]  # [O, I/g, K]
        y = jax.lax.conv_general_dilated(
            full, w.astype(x.dtype),
            window_strides=(self.stride,),
            padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "OIW", "NWC"),
            feature_group_count=self.groups,
        )
        if "bias" in params:
            y = y + params["bias"].astype(y.dtype)
        # carry pinned to the state's storage dtype (compute may run f32
        # while the carry is bf16; a flip breaks scan carry stability)
        new_prev = full[:, full.shape[1] - self.carry:] if self.carry else \
            full[:, :0]
        return y, {"prev": new_prev.astype(state["prev"].dtype)}


@dataclass(frozen=True)
class StatelessConv1d:
    """kernel <= stride (or 1x1 projections): no cross-call context."""
    in_ch: int
    out_ch: int
    kernel: int = 1
    stride: int = 1
    bias: bool = True

    def init_params(self, key, dtype=jnp.float32):
        scale = (self.in_ch * self.kernel) ** -0.5
        p = {"weight": jax.random.normal(
            key, (self.out_ch, self.in_ch, self.kernel), dtype) * scale}
        if self.bias:
            p["bias"] = jnp.zeros((self.out_ch,), dtype)
        return p

    def init_state(self, batch: int, dtype=jnp.float32):
        return {}

    def __call__(self, params, state, x):
        y = jax.lax.conv_general_dilated(
            x, params["weight"].astype(x.dtype),
            window_strides=(self.stride,), padding="VALID",
            dimension_numbers=("NWC", "OIW", "NWC"),
        )
        if "bias" in params:
            y = y + params["bias"].astype(y.dtype)
        return y, state


@dataclass(frozen=True)
class StreamingConvTranspose1d:
    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    groups: int = 1
    bias: bool = True

    @property
    def tail(self) -> int:
        return self.kernel - self.stride

    def init_params(self, key, dtype=jnp.float32):
        scale = (self.in_ch // self.groups * self.kernel) ** -0.5
        # stored [O, I/g, K] like forward convs; transposed semantics applied
        # in __call__ via lhs dilation + kernel flip
        p = {"weight": jax.random.normal(
            key, (self.out_ch, self.in_ch // self.groups, self.kernel), dtype) * scale}
        if self.bias:
            p["bias"] = jnp.zeros((self.out_ch,), dtype)
        return p

    def init_state(self, batch: int, dtype=jnp.float32):
        return {"partial": jnp.zeros((batch, self.tail, self.out_ch), dtype)}

    def __call__(self, params, state, x):
        """x: [B, T, Cin] -> (y [B, T*stride, Cout], new_state).
        Requires T*stride >= kernel - stride (true for all model configs)."""
        b, t, _ = x.shape
        k, s = self.kernel, self.stride
        assert t * s >= self.tail, "step too small for overlap tail"
        w = params["weight"].astype(x.dtype)  # [O, I/g, K]
        # transposed conv = lhs-dilated conv with flipped kernel
        y_full = jax.lax.conv_general_dilated(
            x, jnp.flip(w, axis=-1),
            window_strides=(1,),
            padding=[(k - 1, k - 1)],
            lhs_dilation=(s,),
            dimension_numbers=("NWC", "OIW", "NWC"),
            feature_group_count=self.groups,
        )  # [B, (T-1)*s + k, O]
        emit = t * s
        y = y_full[:, :emit]
        if self.tail:
            pad = jnp.zeros((b, emit - self.tail, self.out_ch), y.dtype)
            y = y + jnp.concatenate([state["partial"].astype(y.dtype), pad], axis=1)
            # keep the carry at the state's storage dtype: compute may
            # run f32 while the ring state is bf16, and a dtype flip
            # breaks scan carry type-stability (surfaced by scan_frames)
            new_partial = y_full[:, emit:].astype(state["partial"].dtype)
        else:
            new_partial = state["partial"]
        if "bias" in params:
            y = y + params["bias"].astype(y.dtype)
        return y, {"partial": new_partial}


def torch_convtr_weight_to_oiw(w: np.ndarray, groups: int = 1) -> np.ndarray:
    """Checkpoint ConvTranspose1d weights are [I, O/g, K]; convert to our
    [O, I/g, K] layout (per-group block transpose for grouped kernels)."""
    i, og, k = w.shape
    ig = i // groups
    blocks = w.reshape(groups, ig, og, k)
    out = np.transpose(blocks, (0, 2, 1, 3)).reshape(groups * og, ig, k)
    return np.ascontiguousarray(out)


def oiw_to_torch_convtr(w: np.ndarray, groups: int = 1) -> np.ndarray:
    """Inverse of torch_convtr_weight_to_oiw: [O, I/g, K] -> [I, O/g, K]
    (used when snapshotting params back to checkpoint layout, e.g. GGUF)."""
    o, ig, k = w.shape
    og = o // groups
    blocks = w.reshape(groups, og, ig, k)
    out = np.transpose(blocks, (0, 2, 1, 3)).reshape(groups * ig, og, k)
    return np.ascontiguousarray(out)
