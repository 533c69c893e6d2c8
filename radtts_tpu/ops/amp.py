"""bf16 mixed-precision scope for the conv param-predictor stacks.

The reference trains under torch AMP (reference: train.py:364,416-422):
convs autocast to half precision while the numerically fragile regions
(text encoder, invertible 1x1 convs — common.py:341,407 autocast(False))
stay fp32. The TPU equivalent implemented here: inside an amp scope the
WN / SimpleConvNet coupling predictors cast their activations to bfloat16
at entry and their predictions back to fp32 on exit. Weights follow the
activation dtype (ops/conv.py casts to x.dtype), so the dilated conv
stacks — the decoder's FLOP and HBM hotspot — run bf16 end to end, while
the flow state z, the logdets, the losses, and the fp32 islands keep full
precision. bf16 needs no loss scaler (8-bit exponent = fp32 range), so
there is no GradScaler equivalent.

The flag is read at TRACE time (same discipline as radtts_tpu.debug):
make_train_step(use_amp=True) wraps its loss under `scope(True)` while
tracing; compiled executables keep the mode they were traced with.
"""

from contextlib import contextmanager

import jax.numpy as jnp

_AMP = False


@contextmanager
def scope(enabled=True):
    global _AMP
    prev = _AMP
    _AMP = bool(enabled)
    try:
        yield
    finally:
        _AMP = prev


def active():
    return _AMP


def cast_in(x):
    """Activation entering a bf16 region."""
    if _AMP and x.dtype == jnp.float32:
        return x.astype(jnp.bfloat16)
    return x


def cast_out(x):
    """Prediction leaving a bf16 region back to the fp32 world."""
    if _AMP and x.dtype == jnp.bfloat16:
        return x.astype(jnp.float32)
    return x
