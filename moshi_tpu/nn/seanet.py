"""SEANet streaming convolutional encoder/decoder (Mimi's acoustic stack).

Behavioral parity with /root/reference/src/moshi/modules/seanet.h
(encoder :54-149, decoder :157-259) and the exact Mimi topology hard-coded
in lm_default.h:327-563:

  encoder: conv(1->64, k7) ; per ratio r in [4,5,6,8]:
           resblock(ch) -> elu -> conv(ch -> 2ch, k=2r, stride=r)
           ; elu -> conv(1024 -> 512, k3)            (24 kHz -> 25 Hz)
  decoder: conv(512->1024, k7) ; per ratio r in [8,6,5,4]:
           elu -> convtr(ch -> ch/2, k=2r, stride=r) -> resblock(ch/2)
           ; elu -> conv(64 -> 1, k3)                (25 Hz -> 24 kHz)
  resblock: [elu -> streaming conv k3 (ch -> ch/2) -> elu -> 1x1 conv
             (ch/2 -> ch)] + identity skip

All convs are causal and streaming (state = carry/overlap buffers,
nn/conv.py).  Module layout keys mirror the checkpoint naming
(`model.N`, `block.M`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from moshi_tpu.nn.conv import (StatelessConv1d, StreamingConv1d,
                               StreamingConvTranspose1d)


def _elu(x):
    return jax.nn.elu(x.astype(jnp.float32)).astype(x.dtype)


@dataclass(frozen=True)
class SEANetConfig:
    channels: int = 1
    dimension: int = 512
    n_filters: int = 64
    ratios: Tuple[int, ...] = (8, 6, 5, 4)   # decoder order; encoder reversed
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out


def _resblock_modules(ch: int, rk: int):
    return {
        "block.1": StreamingConv1d(ch, ch // 2, rk),
        "block.3": StatelessConv1d(ch // 2, ch, 1),
    }


class SEANetEncoder:
    """1 channel @24 kHz -> `dimension` @ 24000/hop Hz (25 Hz for Mimi)."""

    def __init__(self, cfg: SEANetConfig = SEANetConfig()):
        self.cfg = cfg
        mult = 1
        mods: Dict[str, object] = {}
        order: List[str] = []
        idx = 0
        mods[f"model.{idx}"] = StreamingConv1d(cfg.channels,
                                               mult * cfg.n_filters,
                                               cfg.kernel_size)
        order.append(f"model.{idx}")
        idx += 1
        for r in reversed(cfg.ratios):
            ch = mult * cfg.n_filters
            for name, m in _resblock_modules(ch, cfg.residual_kernel_size).items():
                mods[f"model.{idx}.{name}"] = m
            order.append(f"resblock:{idx}")
            idx += 2  # resblock + elu
            mods[f"model.{idx}"] = StreamingConv1d(ch, ch * 2, 2 * r, stride=r)
            order.append(f"elu+model.{idx}")
            idx += 1
            mult *= 2
        idx += 1  # elu
        mods[f"model.{idx}"] = StreamingConv1d(mult * cfg.n_filters,
                                               cfg.dimension,
                                               cfg.last_kernel_size)
        order.append(f"elu+model.{idx}")
        self.modules = mods
        self.order = order

    def init_params(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, len(self.modules))
        return {name: m.init_params(k, dtype)
                for (name, m), k in zip(self.modules.items(), keys)}

    def init_state(self, batch: int, dtype=jnp.float32):
        return {name: m.init_state(batch, dtype)
                for name, m in self.modules.items()}

    def __call__(self, params, state, x, tap=None):
        """x: [B, T, 1], T a multiple of hop_length -> [B, T/hop, dim].
        `tap` prefixes per-module capture points (utils/capture) —
        the analog of the reference's per-op CAPTURE_GROUP scopes."""
        new_state = {}
        from moshi_tpu.utils.capture import capture

        def run(name, h):
            m = self.modules[name]
            if tap:
                # record the op's INPUT and carry STATE too, so
                # utils/replay.seanet_ops can re-execute each streaming
                # conv from recorded state (op-level localization)
                h = capture(f"{tap}/{name}:in", h)
                for sk in state[name]:
                    capture(f"{tap}/{name}:{sk}", state[name][sk])
            y, s = m(params[name], state[name], h)
            new_state[name] = s
            if tap:
                y = capture(f"{tap}/{name}", y)
            return y

        h = x
        for step in self.order:
            if step.startswith("resblock:"):
                i = int(step.split(":")[1])
                skip = h
                h = run(f"model.{i}.block.1", _elu(h))
                h = run(f"model.{i}.block.3", _elu(h))
                h = h + skip
            else:
                name = step.split("+")[-1]
                if step.startswith("elu+"):
                    h = _elu(h)
                h = run(name, h)
        return h, new_state


class SEANetDecoder:
    """`dimension` @25 Hz -> 1 channel @24 kHz."""

    def __init__(self, cfg: SEANetConfig = SEANetConfig()):
        self.cfg = cfg
        mult = 2 ** len(cfg.ratios)
        mods: Dict[str, object] = {}
        order: List[str] = []
        idx = 0
        mods[f"model.{idx}"] = StreamingConv1d(cfg.dimension,
                                               mult * cfg.n_filters,
                                               cfg.kernel_size)
        order.append(f"model.{idx}")
        idx += 2  # conv + elu
        for r in cfg.ratios:
            ch = mult * cfg.n_filters
            mods[f"model.{idx}"] = StreamingConvTranspose1d(ch, ch // 2,
                                                            2 * r, stride=r)
            order.append(f"elu+model.{idx}")
            idx += 1
            for name, m in _resblock_modules(ch // 2,
                                             cfg.residual_kernel_size).items():
                mods[f"model.{idx}.{name}"] = m
            order.append(f"resblock:{idx}")
            idx += 2  # resblock + elu
            mult //= 2
        mods[f"model.{idx}"] = StreamingConv1d(cfg.n_filters, cfg.channels,
                                               cfg.last_kernel_size)
        order.append(f"elu+model.{idx}")
        self.modules = mods
        self.order = order

    def init_params(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, len(self.modules))
        return {name: m.init_params(k, dtype)
                for (name, m), k in zip(self.modules.items(), keys)}

    def init_state(self, batch: int, dtype=jnp.float32):
        return {name: m.init_state(batch, dtype)
                for name, m in self.modules.items()}

    def __call__(self, params, state, x, tap=None):
        """x: [B, T, dim] -> [B, T*hop, 1].  `tap` prefixes per-module
        capture points (utils/capture)."""
        new_state = {}
        from moshi_tpu.utils.capture import capture

        def run(name, h):
            m = self.modules[name]
            if tap:
                # input + carry-state taps for op-level replay
                # (utils/replay.seanet_ops)
                h = capture(f"{tap}/{name}:in", h)
                for sk in state[name]:
                    capture(f"{tap}/{name}:{sk}", state[name][sk])
            y, s = m(params[name], state[name], h)
            new_state[name] = s
            if tap:
                y = capture(f"{tap}/{name}", y)
            return y

        h = x
        for step in self.order:
            if step.startswith("resblock:"):
                i = int(step.split(":")[1])
                skip = h
                h = run(f"model.{i}.block.1", _elu(h))
                h = run(f"model.{i}.block.3", _elu(h))
                h = h + skip
            else:
                name = step.split("+")[-1]
                if step.startswith("elu+"):
                    h = _elu(h)
                h = run(name, h)
        return h, new_state
