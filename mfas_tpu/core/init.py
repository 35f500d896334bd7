"""Weight initializers reproducing the reference's init distributions.

The reference relies on four init families (SURVEY.md §7.1 L1):
  * torch layer defaults  — kaiming_uniform(a=sqrt(5)) weights and
    U(-1/sqrt(fan_in), +1/sqrt(fan_in)) biases (torch Linear/Conv default);
  * explicit kaiming_uniform (a=0) for GP_LeNet/GP_VGG-family convs/linears
    (reference models/central/avmnist.py:38-40);
  * xavier-uniform with the quirky conv fan computation of
    reference models/utils.py:7-25 (HCN skeleton net);
  * ad-hoc: U(-0.1,0.1)+bias 1.8 (surrogate, models/search/surrogate.py:32-35),
    N(0, sqrt(2/n)) resnet convs (models/auxiliary/resnet/resnet.py:32-35),
    N(0,0.1) fusion alphas (models/search/ntu_searchable.py:202-204).

Only distributions are reproduced, not torch's RNG bitstream.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_in_out(shape):
    """fan_in/fan_out like torch.nn.init._calculate_fan_in_and_fan_out."""
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:  # Linear: (out, in)
        return shape[1], shape[0]
    # conv: (out, in, *kernel)
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    return shape[1] * receptive, shape[0] * receptive


def uniform(low, high):
    def f(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=low, maxval=high)

    return f


def normal(mean, std):
    def f(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return f


def constant(value):
    def f(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return f


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def kaiming_uniform(a: float = 0.0):
    """torch.nn.init.kaiming_uniform_ (fan_in, leaky_relu gain)."""

    def f(key, shape, dtype=jnp.float32):
        fan_in, _ = _fan_in_out(shape)
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return f


def torch_default_weight(key, shape, dtype=jnp.float32):
    """torch Linear/Conv default: kaiming_uniform(a=sqrt(5))."""
    return kaiming_uniform(a=math.sqrt(5.0))(key, shape, dtype)


def torch_default_bias(weight_shape):
    """torch Linear/Conv default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in, _ = _fan_in_out(weight_shape)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def f(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return f


def xavier_uniform(key, shape, dtype=jnp.float32):
    """Standard Glorot-uniform (torch fan convention)."""
    fan_in, fan_out = _fan_in_out(shape)
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def hcn_conv_weight(key, shape, dtype=jnp.float32):
    """reference models/utils.py:9-16 conv branch — fan_in=prod(shape[1:4]),
    fan_out=prod(shape[2:4])*shape[0] (indices on the OIHW weight)."""
    fan_in = 1
    for s in shape[1:4]:
        fan_in *= s
    fan_out = shape[0]
    for s in shape[2:4]:
        fan_out *= s
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def resnet_conv_weight(key, shape, dtype=jnp.float32):
    """reference models/auxiliary/resnet/resnet.py:32-35 —
    N(0, sqrt(2/n)), n = k0*k1*out_channels."""
    n = shape[0]  # out_channels
    for s in shape[2:4]:
        n *= s
    return math.sqrt(2.0 / n) * jax.random.normal(key, shape, dtype)


def orthogonal(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(key, shape, dtype)
