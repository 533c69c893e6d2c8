"""Synthesizer engine contract: `bucket_single=True` pads a single-text
request to the batched path's 16-token bucket and must reproduce the
exact-length result (serve.py relies on this to keep a long-running
server's compiled-program set bounded — one program per 16-token bucket,
not one per distinct request length)."""

import numpy as np

import jax

from tests.small_model import MODEL_CONFIG

H_SMALL = {
    "resblock": "1",
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 64,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5]] * 3,
}


def _encode(text):
    return np.array([ord(c) % 150 + 1 for c in text], np.int64)


def _mk_synth(bucket_single):
    from radtts_tpu.models.hifigan import (denoiser_init,
                                           hifigan_generator_init)
    from radtts_tpu.synthesizer import Synthesizer

    # the vocoder's conv_pre is 80-mel (reference hifigan config); keep the
    # rest of the model at the shared reduced-parity dims
    cfg = dict(MODEL_CONFIG, n_mel_channels=80)
    from radtts_tpu.models.radtts import radtts_init
    params = radtts_init(jax.random.PRNGKey(0), cfg)
    voc = hifigan_generator_init(jax.random.PRNGKey(1), H_SMALL)
    den = denoiser_init(voc)
    return Synthesizer.from_parts(
        cfg, params, voc, den, encode_fn=_encode,
        speaker_id_fn=lambda name: 0, seed=11,
        bucket_single=bucket_single)


def test_bucket_single_matches_exact():
    s_exact = _mk_synth(False)
    s_bucket = _mk_synth(True)
    text = "A quick check of bucketing."  # 27 tokens -> bucket N=32
    we, aux_e = s_exact.synthesize(text, "spk", denoising_strength=0.01)
    wb, aux_b = s_bucket.synthesize(text, "spk", denoising_strength=0.01)
    np.testing.assert_array_equal(aux_b["dur"][:, : len(_encode(text))],
                                  aux_e["dur"])
    assert aux_b["dur"].shape[1] % 16 == 0
    assert len(wb[0]) == len(we[0])
    np.testing.assert_allclose(wb[0], we[0], rtol=1e-3, atol=2e-4)

    # two more single texts in the SAME 16-token bucket and the same frame
    # budget bucket: no new duration program may be traced
    n0 = s_bucket._dur_fn._cache_size()
    s_bucket.synthesize("A short check of bucketing!", "spk")
    s_bucket.synthesize("One more bucketed sentence", "spk")
    assert s_bucket._dur_fn._cache_size() == n0
