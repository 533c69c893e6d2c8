"""HiFi-GAN vocoder fine-tuning loop (generator + MPD/MSD adversarial
training with mel L1 and feature-matching losses).

The reference ships the full discriminator/GAN-loss suite but no vocoder
training loop (reference: hifigan_models.py:228-384 — "imported nowhere");
this module closes that gap with the upstream HiFi-GAN recipe (AdamW
betas (0.8, 0.99), lr 2e-4 with 0.999 exponential decay, mel L1 x45,
feature-matching x2, LSGAN adversarial terms, random fixed-size audio
segments) implemented TPU-first: one jitted step updates the
discriminators on stop-gradient generator output, then the generator
against the fresh discriminators; static segment shapes, optax optimizers,
and the same matmul-DFT mel frontend as inference (ops/stft.py).
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from radtts_tpu.models.hifigan import (gaussian_blur_augmentation,
                                       hifigan_generator_apply,
                                       hifigan_generator_init)
from radtts_tpu.models.hifigan_disc import (discriminator_loss, feature_loss,
                                            generator_loss,
                                            multi_period_discriminator_apply,
                                            multi_period_discriminator_init,
                                            multi_scale_discriminator_apply,
                                            multi_scale_discriminator_init)
from radtts_tpu.ops.stft import mel_spectrogram


def vocoder_train_init(key, h):
    """Generator + discriminator params for a HiFi-GAN config dict."""
    kg, kp, ks = jax.random.split(key, 3)
    return {
        "gen": hifigan_generator_init(kg, h),
        "mpd": multi_period_discriminator_init(kp),
        "msd": multi_scale_discriminator_init(ks),
    }


def make_optimizers(lr=2e-4, betas=(0.8, 0.99), lr_decay=0.999,
                    decay_every=1000, weight_decay=0.01):
    """AdamW pair (upstream HiFi-GAN: AdamW betas (0.8, 0.99), weight
    decay 0.01) with stepped exponential decay (upstream decays per epoch;
    decay_every steps approximates that for a step-based loop)."""
    sched = optax.exponential_decay(lr, decay_every, lr_decay,
                                    staircase=True)
    mk = lambda: optax.adamw(sched, b1=betas[0], b2=betas[1],
                             weight_decay=weight_decay)
    return mk(), mk()


def make_vocoder_train_step(mel_kwargs, optim_g, optim_d,
                            p_blurring=0.0, mrf_impl="auto"):
    """Returns jitted step(params, opt_g, opt_d, audio, rng) ->
    (params, opt_g, opt_d, metrics). audio: (B, segment) in [-1, 1]."""

    hop = mel_kwargs["hop_length"]

    def mel_fn(a):
        # crop the centered STFT's trailing frame so segment -> segment//hop
        # frames -> generator output length == segment (upstream HiFi-GAN's
        # segment/frames contract)
        return mel_spectrogram(a, **mel_kwargs)[:, : a.shape[1] // hop]

    def disc_loss_fn(dparams, gen_params, mel_in, audio):
        y_hat = jax.lax.stop_gradient(
            hifigan_generator_apply(gen_params, mel_in, mrf_impl=mrf_impl))
        pr, pg, _, _ = multi_period_discriminator_apply(
            dparams["mpd"], audio, y_hat)
        loss_p, _, _ = discriminator_loss(pr, pg)
        sr, sg_, _, _ = multi_scale_discriminator_apply(
            dparams["msd"], audio, y_hat)
        loss_s, _, _ = discriminator_loss(sr, sg_)
        return loss_p + loss_s, (loss_p, loss_s)

    # The generator pass is differentiated: the Pallas MRF kernel has no
    # transpose rule (jax registers only JVP/batching for pallas_call), so
    # reverse-mode AD through it raises at trace time on TPU. Grads always
    # go through the XLA MRF; the forward-only stop-gradient discriminator
    # pass and inference keep the fused kernel.
    gen_mrf_impl = "xla" if mrf_impl in ("auto", "pallas") else mrf_impl

    def gen_loss_fn(gen_params, dparams, mel_in, mel_target, audio):
        y_hat = hifigan_generator_apply(gen_params, mel_in,
                                        mrf_impl=gen_mrf_impl)
        mel_hat = mel_fn(y_hat)
        loss_mel = jnp.mean(jnp.abs(mel_hat - mel_target)) * 45.0
        pr, pg, fr, fg = multi_period_discriminator_apply(
            dparams["mpd"], audio, y_hat)
        sr, sg_, fsr, fsg = multi_scale_discriminator_apply(
            dparams["msd"], audio, y_hat)
        loss_fm = feature_loss(fr, fg) + feature_loss(fsr, fsg)
        loss_adv_p, _ = generator_loss(pg)
        loss_adv_s, _ = generator_loss(sg_)
        total = loss_mel + loss_fm + loss_adv_p + loss_adv_s
        return total, (loss_mel, loss_fm, loss_adv_p + loss_adv_s)

    @jax.jit
    def step(params, opt_g, opt_d, audio, rng):
        mel_target = mel_fn(audio)
        mel_in = mel_target
        if p_blurring > 0.0:
            mel_in = gaussian_blur_augmentation(rng, mel_in,
                                                p_blurring=p_blurring)

        # discriminators first, on frozen generator output
        dparams = {"mpd": params["mpd"], "msd": params["msd"]}
        (loss_d, (ld_p, ld_s)), grads_d = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(dparams, params["gen"], mel_in,
                                        audio)
        upd_d, opt_d = optim_d.update(grads_d, opt_d, dparams)
        dparams = optax.apply_updates(dparams, upd_d)

        # generator against the fresh discriminators
        (loss_g, (l_mel, l_fm, l_adv)), grads_g = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(params["gen"], dparams, mel_in,
                                       mel_target, audio)
        upd_g, opt_g = optim_g.update(grads_g, opt_g, params["gen"])
        gen = optax.apply_updates(params["gen"], upd_g)

        params = {"gen": gen, "mpd": dparams["mpd"], "msd": dparams["msd"]}
        metrics = {"loss_disc": loss_d, "loss_gen": loss_g,
                   "loss_mel": l_mel, "loss_fm": l_fm, "loss_adv": l_adv}
        return params, opt_g, opt_d, metrics

    return step


class SegmentSampler:
    """Random fixed-size audio segments from a wav list (host side).

    Wavs shorter than the segment are reflect-padded. Audio is scaled to
    [-1, 1] like the data pipeline (int16 / 32768)."""

    def __init__(self, paths, segment_size, seed=0):
        from scipy.io import wavfile
        self.audio = []
        for p in paths:
            _, w = wavfile.read(p)
            if w.dtype.kind == "i":
                w = w.astype(np.float32) / 32768.0
            elif w.dtype.kind == "f":
                w = w.astype(np.float32)
            if w.ndim > 1:
                w = w[:, 0]
            if len(w) < segment_size:
                w = np.pad(w, (0, segment_size - len(w)), mode="reflect")
            self.audio.append(w)
        self.segment_size = segment_size
        self.seed = seed
        self.rng = np.random.default_rng(seed)

    def sample(self, batch_size, step=None):
        """step=None: draw from the sampler's own stream. step=i: derive
        the stream from (seed, i) so a resumed run at iteration i draws
        the SAME segments the uninterrupted run would have — bit-exact
        resume (train_vocoder.py passes the iteration)."""
        rng = (self.rng if step is None
               else np.random.default_rng((self.seed, int(step))))
        out = np.empty((batch_size, self.segment_size), np.float32)
        for b in range(batch_size):
            w = self.audio[rng.integers(len(self.audio))]
            o = rng.integers(0, len(w) - self.segment_size + 1)
            out[b] = w[o: o + self.segment_size]
        return out
