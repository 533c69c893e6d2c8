"""Vocoder checkpoint loading: reference HiFi-GAN torch checkpoints
({'generator': state_dict}) + JSON config -> jax params + denoiser
(behavior parity with reference inference.py:52-78)."""

import json


def load_vocoder(vocoder_path, config_path, aot_dir=None):
    """Load a torch HiFi-GAN checkpoint + build the denoiser.

    aot_dir: optional serialized-executable store directory
    (radtts_tpu/aot_store.py) for the denoiser's one-shot bias program —
    on tunneled TPU backends that compile costs ~34 s per process and
    the XLA persistent cache does not cover it, so serving/CLI callers
    pass their store directory here."""
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
    wrap = None
    if aot_dir:
        from radtts_tpu.aot_store import AOTStore
        store = AOTStore.open(aot_dir, extra=("denoiser_bias",),
                              log=lambda m: print(f"[vocoder] {m}",
                                                  flush=True))
        if store is not None:
            wrap = lambda f: store.wrap("denbias", f)  # noqa: E731
    denoiser = denoiser_init(generator, wrap=wrap)
    return generator, denoiser
