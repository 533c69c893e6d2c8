"""End-to-end CLI drive for every attribute-model family (DAP regression,
BGAP bipartite flows, AGAP autoregressive flows): build a reduced-size
reference torch checkpoint + HiFi-GAN vocoder checkpoint on disk, then run
`python inference.py` and check a finite, non-silent wav comes out."""

import copy
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch
from scipy.io import wavfile

from tests.ref_utils import install_reference

install_reference()

HIFIGAN_SMALL = {
    "resblock": "1",
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 64,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "gaussian_blur": {"p_blurring": 0.0},
}

SHRINK = {
    "n_text_dim": 64,
    "n_hidden": 32,
    "n_flows": 4,
    "mel_encoder_n_hidden": 64,
    "n_mel_channels": 80,
}


def shrink_model_config(mc):
    """Reduce every submodel consistently (dims must agree or the reference
    itself would fail at inference)."""
    mc.update(SHRINK)
    for key in ("dur_model_config", "f0_model_config",
                "energy_model_config", "v_model_config"):
        sub = mc.get(key)
        if not sub:
            continue
        h = sub["hparams"]
        if "bottleneck_hparams" in h:
            h["bottleneck_hparams"]["in_dim"] = 64
        if sub["name"] == "dap":
            h["arch_hparams"]["n_channels"] = 32
        elif sub["name"] == "agap":
            h["n_hidden"] = 32
            if h.get("spline_flow_params"):
                h["spline_flow_params"]["n_context_dim"] = 32
    return mc


def build_fixtures(tmp_path, config_name):
    from hifigan_env import AttrDict
    from hifigan_models import Generator
    from radtts import RADTTS as RefRADTTS
    from tests.ref_utils import converge_spectral_norms

    with open(f"configs/{config_name}") as f:
        config = json.load(f)
    mc = shrink_model_config(config["model_config"])

    torch.manual_seed(0)
    # the reference mutates spline_flow_params in place at build time
    ref = RefRADTTS(**copy.deepcopy(mc))
    converge_spectral_norms(ref)
    radtts_ckpt = tmp_path / "radtts_ckpt.pt"
    torch.save({"state_dict": ref.state_dict(), "iteration": 10,
                "learning_rate": 1e-4}, radtts_ckpt)

    voc = Generator(AttrDict(dict(HIFIGAN_SMALL)))
    voc_ckpt = tmp_path / "hifigan.pt"
    torch.save({"generator": voc.state_dict()}, voc_ckpt)
    voc_cfg = tmp_path / "hifigan_config.json"
    voc_cfg.write_text(json.dumps(HIFIGAN_SMALL))

    # tiny filelist (inference only reads it for the speaker table)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    sr = 22050
    wavfile.write(wav_dir / "a.wav", sr,
                  (0.1 * np.sin(np.arange(sr) / 30)).astype(np.float32))
    (tmp_path / "list.txt").write_text("a.wav|hello there|ljs\n")

    sentences = tmp_path / "sentences.txt"
    sentences.write_text("The quick brown fox jumps over the lazy dog.\n")

    cfg_path = tmp_path / "config.json"
    config["data_config"]["training_files"] = {
        "LJS": {"basedir": str(tmp_path), "audiodir": "wavs",
                "filelist": "list.txt", "lmdbpath": ""}}
    config["data_config"]["validation_files"] = config["data_config"][
        "training_files"]
    config["data_config"]["betabinom_cache_path"] = str(tmp_path / "cache")
    cfg_path.write_text(json.dumps(config))
    return cfg_path, radtts_ckpt, voc_ckpt, voc_cfg, sentences


def drive_inference_cli(tmp_path, config_name):
    cfg_path, radtts_ckpt, voc_ckpt, voc_cfg, sentences = build_fixtures(
        tmp_path, config_name)
    out_dir = tmp_path / "results"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, "inference.py", "-c", str(cfg_path),
         "-r", str(radtts_ckpt), "-v", str(voc_ckpt),
         "-k", str(voc_cfg), "-t", str(sentences), "-s", "ljs",
         "-o", str(out_dir), "--seed", "7"],
        capture_output=True, text=True, env=env, timeout=1800)
    assert result.returncode == 0, result.stderr[-4000:]

    wavs = list(out_dir.glob("*.wav"))
    assert wavs, result.stdout[-2000:]
    sr_out, audio = wavfile.read(wavs[0])
    assert sr_out == 22050
    assert np.isfinite(audio).all()
    assert len(audio) > 22050 * 0.2  # at least 0.2 s
    assert np.abs(audio).max() > 1e-4  # not silence


@pytest.mark.slow
def test_inference_cli_dap(tmp_path):
    drive_inference_cli(tmp_path, "config_ljs_dap.json")


@pytest.mark.slow
def test_inference_cli_bgap(tmp_path):
    drive_inference_cli(tmp_path, "config_ljs_bgap.json")


@pytest.mark.slow
def test_inference_cli_agap(tmp_path):
    drive_inference_cli(tmp_path, "config_ljs_agap.json")


@pytest.mark.slow
def test_inference_cli_batched(tmp_path):
    """--batch_size 2 over three lines: two dispatches, three wavs, each
    trimmed to its own duration budget."""
    cfg_path, radtts_ckpt, voc_ckpt, voc_cfg, sentences = build_fixtures(
        tmp_path, "config_ljs_dap.json")
    sentences.write_text(
        "The quick brown fox jumps over the lazy dog.\n"
        "Hello world.\n"
        "A third, somewhat longer sentence for the second batch.\n")
    out_dir = tmp_path / "results_b2"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, "inference.py", "-c", str(cfg_path),
         "-r", str(radtts_ckpt), "-v", str(voc_ckpt),
         "-k", str(voc_cfg), "-t", str(sentences), "-s", "ljs",
         "-o", str(out_dir), "--seed", "7", "--batch_size", "2"],
        capture_output=True, text=True, env=env, timeout=1800)
    assert result.returncode == 0, result.stderr[-4000:]

    wavs = sorted(out_dir.glob("*.wav"))
    assert len(wavs) == 3, result.stdout[-2000:]
    lengths = []
    for w in wavs:
        sr_out, audio = wavfile.read(w)
        assert sr_out == 22050
        assert np.isfinite(audio).all()
        assert np.abs(audio).max() > 1e-4
        lengths.append(len(audio))
    # per-item trimming: the wavs must not all share the padded length
    assert len(set(lengths)) > 1, lengths


def test_use_amp_changes_traced_dtype():
    """--use_amp wiring (reference autocast anchor: inference.py:121):
    tracing the inference graph under the amp scope must run the coupling
    predictor stacks in bfloat16; without the flag no bf16 op may appear.
    Guards against the flag silently becoming dead again."""
    import jax
    import jax.numpy as jnp

    from radtts_tpu.models.radtts import radtts_infer, radtts_init
    from radtts_tpu.ops import amp as _amp
    from radtts_tpu.ops.invertible import precompute_inverses
    from tests.small_model import MODEL_CONFIG

    params = precompute_inverses(
        radtts_init(jax.random.PRNGKey(0), MODEL_CONFIG))
    B, N, T = 1, 8, 16
    text = jnp.ones((B, N), jnp.int32)
    spk = jnp.zeros((B,), jnp.int32)
    dur = jnp.full((B, N), T // N, jnp.int32)

    def traced(use_amp):
        def f(params, rng):
            with _amp.scope(use_amp):
                out = radtts_infer(params, rng, spk, text, 0.8, T, dur=dur,
                                   sigma_f0=1.0, sigma_energy=1.0)
            return out["mel"]
        return str(jax.make_jaxpr(f)(params, jax.random.PRNGKey(0)))

    assert "bf16" in traced(True)
    assert "bf16" not in traced(False)
