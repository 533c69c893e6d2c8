"""Weight initializers matching the reference's torch init conventions.

Xavier-uniform with a nonlinearity gain (reference: common.py:108-154 uses
``torch.nn.init.xavier_uniform_`` with ``calculate_gain``) so that randomly
initialized models here are statistically identical to the reference's.
"""

import math

import jax
import jax.numpy as jnp

_GAINS = {
    "linear": 1.0,
    "relu": math.sqrt(2.0),
    "tanh": 5.0 / 3.0,
    "sigmoid": 1.0,
}


def xavier_uniform(key, shape, fan_in, fan_out, gain_name="linear",
                   dtype=jnp.float32):
    gain = _GAINS[gain_name]
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def kaiming_uniform_bias(key, shape, fan_in, dtype=jnp.float32):
    """torch's default Conv/Linear bias init: U(-1/sqrt(fan_in), +)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
