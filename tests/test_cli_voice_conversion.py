"""End-to-end voice-conversion CLI drive on CPU: GT-duration extraction via
the training alignment path, resynthesis with predicted features."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch
from scipy.io import wavfile

from tests.ref_utils import converge_spectral_norms, install_reference

install_reference()

HIFIGAN_SMALL = {
    "resblock": "2",
    "upsample_rates": [8, 8, 4],
    "upsample_kernel_sizes": [16, 16, 8],
    "upsample_initial_channel": 48,
    "resblock_kernel_sizes": [3, 7],
    "resblock_dilation_sizes": [[1, 3], [1, 3]],
    "gaussian_blur": {"p_blurring": 0.0},
}


@pytest.mark.slow
def test_voice_conversion_cli(tmp_path):
    from hifigan_env import AttrDict
    from hifigan_models import Generator
    from radtts import RADTTS as RefRADTTS

    with open("configs/config_ljs_dap.json") as f:
        config = json.load(f)
    mc = config["model_config"]
    mc.update({"n_text_dim": 64, "n_hidden": 32, "n_flows": 4,
               "mel_encoder_n_hidden": 64})
    for key in ("dur_model_config", "f0_model_config",
                "energy_model_config", "v_model_config"):
        mc[key]["hparams"]["bottleneck_hparams"]["in_dim"] = 64
        mc[key]["hparams"]["arch_hparams"]["n_channels"] = 32

    torch.manual_seed(0)
    ref = RefRADTTS(**mc)
    converge_spectral_norms(ref)
    radtts_ckpt = tmp_path / "radtts_ckpt.pt"
    torch.save({"state_dict": ref.state_dict()}, radtts_ckpt)
    voc = Generator(AttrDict(dict(HIFIGAN_SMALL)))
    voc_ckpt = tmp_path / "hifigan.pt"
    torch.save({"generator": voc.state_dict()}, voc_ckpt)
    voc_cfg = tmp_path / "hifigan_config.json"
    voc_cfg.write_text(json.dumps(HIFIGAN_SMALL))

    # int16 wavs (the pipeline normalizes by max_wav_value=32768)
    sr = 22050
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * 0.6)) / sr
    y = 0.4 * np.sin(2 * np.pi * 200 * t) + 0.02 * rng.standard_normal(
        len(t))
    wavfile.write(wav_dir / "a.wav", sr, (y * 32767).astype(np.int16))
    (tmp_path / "list.txt").write_text("a.wav|hello there|ljs\n")

    config["data_config"]["training_files"] = {
        "LJS": {"basedir": str(tmp_path), "audiodir": "wavs",
                "filelist": "list.txt", "lmdbpath": ""}}
    config["data_config"]["validation_files"] = config["data_config"][
        "training_files"]
    config["data_config"]["betabinom_cache_path"] = str(tmp_path / "cache")
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))

    out_dir = tmp_path / "vc_out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, "inference_voice_conversion.py",
         "-r", str(radtts_ckpt), "-c", str(cfg_path),
         "-v", str(voc_ckpt), "-k", str(voc_cfg),
         "-o", str(out_dir), "-n", "1", "--predict_features",
         "--save_features", "--seed", "3"],
        capture_output=True, text=True, env=env, timeout=1800)
    assert result.returncode == 0, result.stderr[-4000:]

    wavs = list(out_dir.glob("*.wav"))
    assert wavs, result.stdout[-2000:]
    sr_out, audio = wavfile.read(wavs[0])
    assert np.isfinite(audio).all()
    f0s = list(out_dir.glob("*_f0.npy"))
    assert f0s and np.isfinite(np.load(f0s[0])).all()
