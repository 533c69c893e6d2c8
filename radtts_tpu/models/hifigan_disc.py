"""HiFi-GAN discriminators and GAN losses (capability parity with reference
hifigan_models.py:228-384 — the reference ships them unused; they enable
vocoder fine-tuning). Channels-last; grouped convs via feature_group_count."""

import jax
import jax.numpy as jnp
from jax import lax

from radtts_tpu.ops.static import static

LRELU_SLOPE = 0.1
_DN1 = ("NHC", "HIO", "NHC")
_DN2 = ("NHWC", "HWIO", "NHWC")


def _conv1d_init(key, in_ch, out_ch, k, groups=1):
    w = 0.01 * jax.random.normal(key, (k, in_ch // groups, out_ch))
    return {"w": w, "b": jnp.zeros((out_ch,))}


def _conv1d(p, x, stride=1, padding=0, groups=1):
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride,),
        padding=[(padding, padding)], dimension_numbers=_DN1,
        feature_group_count=groups)
    return y + p["b"].astype(x.dtype)


def _conv2d_init(key, in_ch, out_ch, kh, kw):
    w = 0.01 * jax.random.normal(key, (kh, kw, in_ch, out_ch))
    return {"w": w, "b": jnp.zeros((out_ch,))}


def _conv2d(p, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride,
        padding=list(padding), dimension_numbers=_DN2)
    return y + p["b"].astype(x.dtype)


def _get_padding(k, d=1):
    return int((k * d - d) / 2)


# ---------------------------------------------------------------------------
# period discriminator (reference: hifigan_models.py:228-262)
# ---------------------------------------------------------------------------


def discriminator_p_init(key, period, kernel_size=5, stride=3):
    keys = jax.random.split(key, 6)
    chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
    convs = [_conv2d_init(keys[i], c_in, c_out, kernel_size, 1)
             for i, (c_in, c_out) in enumerate(chans)]
    post = _conv2d_init(keys[5], 1024, 1, 3, 1)
    return {"convs": convs, "post": post,
            "_meta": static(period=period, kernel_size=kernel_size,
                            stride=stride)}


def discriminator_p_apply(params, x):
    """x: (B, T) waveform. Returns (score, fmaps)."""
    meta = params["_meta"]
    period = meta["period"]
    B, T = x.shape
    if T % period != 0:
        n_pad = period - (T % period)
        x = jnp.concatenate([x, jnp.flip(x[:, -n_pad:], axis=1)], axis=1)
        T = T + n_pad
    h = x.reshape(B, T // period, period, 1)  # NHWC
    fmap = []
    pad = _get_padding(5, 1)
    for i, conv in enumerate(params["convs"]):
        stride = meta["stride"] if i < 4 else 1
        p = pad if i < 4 else 2
        h = _conv2d(conv, h, stride=(stride, 1), padding=((p, p), (0, 0)))
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
    h = _conv2d(params["post"], h, padding=((1, 1), (0, 0)))
    fmap.append(h)
    return h.reshape(B, -1), fmap


def multi_period_discriminator_init(key):
    periods = (2, 3, 5, 7, 11)
    keys = jax.random.split(key, len(periods))
    return {"discs": [discriminator_p_init(k, p)
                      for k, p in zip(keys, periods)]}


def multi_period_discriminator_apply(params, y, y_hat):
    outs = ([], [], [], [])
    for d in params["discs"]:
        s_r, f_r = discriminator_p_apply(d, y)
        s_g, f_g = discriminator_p_apply(d, y_hat)
        outs[0].append(s_r)
        outs[1].append(s_g)
        outs[2].append(f_r)
        outs[3].append(f_g)
    return outs


# ---------------------------------------------------------------------------
# scale discriminator (reference: hifigan_models.py:292-350)
# ---------------------------------------------------------------------------

_S_SPECS = [  # (in, out, k, stride, groups, pad)
    (1, 128, 15, 1, 1, 7),
    (128, 128, 41, 2, 4, 20),
    (128, 256, 41, 2, 16, 20),
    (256, 512, 41, 4, 16, 20),
    (512, 1024, 41, 4, 16, 20),
    (1024, 1024, 41, 1, 16, 20),
    (1024, 1024, 5, 1, 1, 2),
]


def discriminator_s_init(key):
    keys = jax.random.split(key, len(_S_SPECS) + 1)
    convs = [_conv1d_init(keys[i], ci, co, k, groups=g)
             for i, (ci, co, k, s, g, p) in enumerate(_S_SPECS)]
    post = _conv1d_init(keys[-1], 1024, 1, 3)
    return {"convs": convs, "post": post}


def discriminator_s_apply(params, x):
    h = x[:, :, None]  # (B, T, 1)
    fmap = []
    for conv, (ci, co, k, s, g, p) in zip(params["convs"], _S_SPECS):
        h = _conv1d(conv, h, stride=s, padding=p, groups=g)
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
    h = _conv1d(params["post"], h, padding=1)
    fmap.append(h)
    return h.reshape(h.shape[0], -1), fmap


def _avg_pool1d(x, k=4, stride=2, pad=2):
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    y = lax.reduce_window(xp, 0.0, lax.add, (1, k), (1, stride),
                          "VALID")
    return y / k


def multi_scale_discriminator_init(key):
    keys = jax.random.split(key, 3)
    return {"discs": [discriminator_s_init(k) for k in keys]}


def multi_scale_discriminator_apply(params, y, y_hat):
    outs = ([], [], [], [])
    for i, d in enumerate(params["discs"]):
        if i != 0:
            y = _avg_pool1d(y)
            y_hat = _avg_pool1d(y_hat)
        s_r, f_r = discriminator_s_apply(d, y)
        s_g, f_g = discriminator_s_apply(d, y_hat)
        outs[0].append(s_r)
        outs[1].append(s_g)
        outs[2].append(f_r)
        outs[3].append(f_g)
    return outs


# ---------------------------------------------------------------------------
# GAN losses (reference: hifigan_models.py:353-384)
# ---------------------------------------------------------------------------


def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(real_outputs, generated_outputs):
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outputs, generated_outputs):
        r_loss = jnp.mean(jnp.square(1 - dr))
        g_loss = jnp.mean(jnp.square(dg))
        loss = loss + r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.square(1 - dg))
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses
