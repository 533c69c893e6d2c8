"""HiFi-GAN discriminator suite: shape/finiteness smoke + GAN loss parity
with the reference loss functions on identical inputs."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.ref_utils import install_reference

install_reference()

from hifigan_models import (discriminator_loss as ref_d_loss,  # noqa: E402
                            feature_loss as ref_f_loss,
                            generator_loss as ref_g_loss)

from radtts_tpu.models.hifigan_disc import (  # noqa: E402
    discriminator_loss, feature_loss, generator_loss,
    multi_period_discriminator_apply, multi_period_discriminator_init,
    multi_scale_discriminator_apply, multi_scale_discriminator_init)


def test_discriminators_run():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    y = jax.random.normal(k1, (2, 4096)) * 0.3
    y_hat = jax.random.normal(k2, (2, 4096)) * 0.3

    mpd = multi_period_discriminator_init(k3)
    s_r, s_g, f_r, f_g = multi_period_discriminator_apply(mpd, y, y_hat)
    assert len(s_r) == 5 and len(f_r) == 5
    assert all(np.isfinite(np.asarray(s)).all() for s in s_r + s_g)

    msd = multi_scale_discriminator_init(k3)
    s_r2, s_g2, f_r2, f_g2 = multi_scale_discriminator_apply(msd, y, y_hat)
    assert len(s_r2) == 3
    assert all(np.isfinite(np.asarray(s)).all() for s in s_r2 + s_g2)

    d_loss, _, _ = discriminator_loss(s_r, s_g)
    g_loss, _ = generator_loss(s_g)
    f_loss = feature_loss(f_r, f_g)
    for v in (d_loss, g_loss, f_loss):
        assert np.isfinite(float(v))


def test_gan_losses_match_reference():
    torch.manual_seed(0)
    reals = [torch.randn(2, 50) for _ in range(3)]
    fakes = [torch.randn(2, 50) for _ in range(3)]
    fmap_r = [[torch.randn(2, 7, 5) for _ in range(2)] for _ in range(3)]
    fmap_g = [[torch.randn(2, 7, 5) for _ in range(2)] for _ in range(3)]

    ref_d, _, _ = ref_d_loss(reals, fakes)
    ref_g, _ = ref_g_loss(fakes)
    ref_f = ref_f_loss(fmap_r, fmap_g)

    j = lambda t: jnp.asarray(t.numpy())
    our_d, _, _ = discriminator_loss([j(t) for t in reals],
                                     [j(t) for t in fakes])
    our_g, _ = generator_loss([j(t) for t in fakes])
    our_f = feature_loss([[j(t) for t in f] for f in fmap_r],
                         [[j(t) for t in f] for f in fmap_g])
    np.testing.assert_allclose(float(our_d), float(ref_d), rtol=1e-5)
    np.testing.assert_allclose(float(our_g), float(ref_g), rtol=1e-5)
    np.testing.assert_allclose(float(our_f), float(ref_f), rtol=1e-5)
