"""Vocoder checkpoint loading: reference HiFi-GAN torch checkpoints
({'generator': state_dict}) + JSON config -> jax params + denoiser
(behavior parity with reference inference.py:52-78)."""

import json


def load_vocoder(vocoder_path, config_path):
    import torch

    from radtts_tpu.models.hifigan import (denoiser_init,
                                           hifigan_generator_from_torch)

    with open(config_path) as f:
        h = json.load(f)
    if "blur" in vocoder_path:
        h.setdefault("gaussian_blur", {})["p_blurring"] = 0.5
    else:
        h.setdefault("gaussian_blur", {})["p_blurring"] = 0.0

    ckpt = torch.load(vocoder_path, map_location="cpu", weights_only=False)
    state_dict = ckpt["generator"] if "generator" in ckpt else ckpt
    generator = hifigan_generator_from_torch(state_dict, h)
    denoiser = denoiser_init(generator)
    return generator, denoiser
