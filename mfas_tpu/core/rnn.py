"""Recurrent layers as `lax.scan` loops (torch LSTM/GRU single-layer
semantics, torch state_dict param names/gate order)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from mfas_tpu.core import init as I
from mfas_tpu.core.module import Module, Rng


class _RNNBase(Module):
    gates = 4

    def __init__(self, input_size, hidden_size, batch_first=False,
                 weight_init=None, bias_init=None):
        super().__init__()
        self.input_size = int(input_size)
        self.hidden_size = int(hidden_size)
        self.batch_first = batch_first
        bound = 1.0 / math.sqrt(self.hidden_size)
        self.weight_init = weight_init or I.uniform(-bound, bound)
        self.bias_init = bias_init or I.uniform(-bound, bound)

    def create(self, rng: Rng):
        g, h, i = self.gates, self.hidden_size, self.input_size
        return {
            "weight_ih_l0": self.weight_init(rng.next(), (g * h, i)),
            "weight_hh_l0": self.weight_init(rng.next(), (g * h, h)),
            "bias_ih_l0": self.bias_init(rng.next(), (g * h,)),
            "bias_hh_l0": self.bias_init(rng.next(), (g * h,)),
        }

    def leaf_kinds(self):
        return {k: "param" for k in
                ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0")}


class LSTM(_RNNBase):
    """torch nn.LSTM(num_layers=1). Gate order i,f,g,o."""

    gates = 4

    def apply(self, tree, ctx, x, state=None):
        if self.batch_first:
            x = jnp.swapaxes(x, 0, 1)  # -> (T, B, in)
        T, B = x.shape[0], x.shape[1]
        H = self.hidden_size
        w_ih, w_hh = tree["weight_ih_l0"], tree["weight_hh_l0"]
        b = tree["bias_ih_l0"] + tree["bias_hh_l0"]
        if state is None:
            h0 = jnp.zeros((B, H), x.dtype)
            c0 = jnp.zeros((B, H), x.dtype)
        else:
            h0, c0 = state

        x_proj = jnp.einsum("tbi,gi->tbg", x, w_ih) + b  # (T,B,4H)

        def step(carry, xp):
            h, c = carry
            z = xp + h @ w_hh.T
            i_, f_, g_, o_ = jnp.split(z, 4, axis=-1)
            i_ = jax.nn.sigmoid(i_)
            f_ = jax.nn.sigmoid(f_)
            g_ = jnp.tanh(g_)
            o_ = jax.nn.sigmoid(o_)
            c = f_ * c + i_ * g_
            h = o_ * jnp.tanh(c)
            return (h, c), h

        (hT, cT), outs = lax.scan(step, (h0, c0), x_proj)
        if self.batch_first:
            outs = jnp.swapaxes(outs, 0, 1)
        return outs, (hT, cT)


class GRU(_RNNBase):
    """torch nn.GRU(num_layers=1). Gate order r,z,n with
    n = tanh(W_in x + b_in + r*(W_hn h + b_hn))."""

    gates = 3

    def apply(self, tree, ctx, x, state=None):
        if self.batch_first:
            x = jnp.swapaxes(x, 0, 1)
        T, B = x.shape[0], x.shape[1]
        H = self.hidden_size
        w_ih, w_hh = tree["weight_ih_l0"], tree["weight_hh_l0"]
        b_ih, b_hh = tree["bias_ih_l0"], tree["bias_hh_l0"]
        h0 = jnp.zeros((B, H), x.dtype) if state is None else state

        x_proj = jnp.einsum("tbi,gi->tbg", x, w_ih) + b_ih  # (T,B,3H)

        def step(h, xp):
            hp = h @ w_hh.T + b_hh  # (B,3H)
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        hT, outs = lax.scan(step, h0, x_proj)
        if self.batch_first:
            outs = jnp.swapaxes(outs, 0, 1)
        return outs, hT
