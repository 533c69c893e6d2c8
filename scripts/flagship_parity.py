#!/usr/bin/env python
"""Flagship-scale converted-checkpoint parity: mel MAE vs the PyTorch
reference with IDENTICAL weights and injected noise.

BASELINE.md's north star is mel MAE < 1e-3 against the reference given the
same checkpoint weights. The reference's public RADTTS++DAP-LJS artifact is
a download link (reference README.md:16-18) — not fetchable in this
environment — so this script builds a torch checkpoint AT FULL FLAGSHIP
SCALE (config_ljs_dap model_config, unmodified: 1024-wide WN couplings,
n_flows 8, 185-symbol table), converts it, and compares the two inference
paths end to end (durations fixed, z_f0/z_energy/residual injected).

    JAX_PLATFORMS=cpu python scripts/flagship_parity.py   # CPU oracle
    python scripts/flagship_parity.py                     # on-TPU MAE

Prints ONE JSON line: {"mel_mae": ..., "f0_mae": ..., "platform": ...}.
"""

import copy
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
# MATMUL_PRECISION=highest forces fp32-accurate matmuls/convs on TPU (the
# MXU's DEFAULT runs bf16 passes; fine for speed, it is what inference.py
# uses, but parity against the fp32 torch oracle needs the exact path)
if os.environ.get("MATMUL_PRECISION"):
    jax.config.update("jax_default_matmul_precision",
                      os.environ["MATMUL_PRECISION"])

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    from ref_utils import converge_spectral_norms, install_reference
    install_reference()
    from radtts import RADTTS as RefRADTTS

    from radtts_tpu.convert import radtts_from_torch
    from radtts_tpu.models.radtts import radtts_infer
    from radtts_tpu.ops.invertible import precompute_inverses
    from radtts_tpu.text.processing import TextProcessing

    with open("configs/config_ljs_dap.json") as f:
        model_config = json.load(f)["model_config"]

    # FLAGSHIP_ORACLE=path caches the torch side (the ~30 min of a run) so
    # precision/platform A/Bs on the jax side rerun in minutes
    oracle_path = os.environ.get("FLAGSHIP_ORACLE", "")
    oracle = None
    # v2: WN prediction heads perturbed away from zero init (see below) —
    # older caches hold the vacuous zero-head model and must be rebuilt
    ORACLE_VERSION = 2
    if oracle_path and os.path.exists(oracle_path):
        oracle = dict(np.load(oracle_path))
        if int(oracle.get("version", np.asarray(1))) != ORACLE_VERSION:
            print(f"# torch oracle at {oracle_path} is a stale version "
                  f"({int(oracle.get('version', np.asarray(1)))} != "
                  f"{ORACLE_VERSION}); rebuilding", file=sys.stderr)
            oracle = None
        else:
            print(f"# loaded torch oracle from {oracle_path}",
                  file=sys.stderr)

    if oracle is None:
        torch.manual_seed(0)
        print("# building flagship reference model...", file=sys.stderr)
        ref = RefRADTTS(**copy.deepcopy(model_config)).eval()
        converge_spectral_norms(ref)
        # the reference ZERO-initializes every WN prediction head
        # (common.py:540-542): on a fresh model each coupling is a
        # constant-scale transform and mel parity never exercises the WN
        # internals (1024-wide conv stacks — the decode FLOP hotspot).
        # Perturb the heads deterministically so the flagship comparison
        # covers the real flow compute path. sd 0.002, NOT larger: the
        # head sums 1024 channels, so at 0.05 the tanh scaling saturates
        # and (z-b)/s compounds to overflow across the 8 inverse flows
        # (measured NaN on chip, scripts/ab_fold_bf16.py); 0.002 keeps s
        # within a few percent of 1 with the WN stacks still contributing.
        torch.manual_seed(1)
        with torch.no_grad():
            for fs in ref.flows:
                head = fs.affine_tfn.affine_param_predictor
                head = head.end if hasattr(head, "end") else head.last_layer
                head.weight.normal_(0, 0.002)
                head.bias.normal_(0, 0.002)
        sd = ref.state_dict()
    else:
        sd = {k[len("sd/"):]: torch.from_numpy(v)
              for k, v in oracle.items() if k.startswith("sd/")}
    params = radtts_from_torch(sd, model_config)
    params = precompute_inverses(params)

    tp = TextProcessing(
        "radtts", ["radtts_cleaners"], "radtts_tpu/text/assets/heteronyms",
        "radtts_tpu/text/assets/cmudict-0.7b", p_phoneme=1.0,
        handle_phoneme="word", handle_phoneme_ambiguous="ignore",
        prepend_space_to_text=True, append_space_to_text=True)
    text_np = np.asarray(tp.encode_text(
        "It is well known that deep generative models have a rich latent "
        "space."), dtype=np.int64)[None]
    N = text_np.shape[1]

    g = model_config["n_group_size"]
    n_mel = model_config["n_mel_channels"]
    max_frames = 512
    assert max_frames % (16 * g) == 0

    dur = torch.zeros(1, N, dtype=torch.long)
    dur[:] = max_frames // N
    dur[:, -1] += max_frames - int(dur.sum())

    torch.manual_seed(3)
    z_f0 = torch.randn(1, 1, max_frames) * 0.8
    z_energy = torch.randn(1, 1, max_frames) * 0.8
    residual = torch.randn(1, n_mel * g, max_frames // g) * 0.7

    # noise-injection shims (reference overwrites allocated noise via
    # .normal_(), radtts.py:559,607,622,655, and builds LongTensor from a
    # list of tensors, radtts.py:575)
    class _FixedTensor(torch.Tensor):
        def normal_(self):
            return self

    class _FixedNoise:
        def __init__(self, tensors):
            self.tensors = list(tensors)

        def __call__(self, *shape):
            t = self.tensors.pop(0).clone()
            return torch.Tensor._make_subclass(_FixedTensor, t)

    if oracle is None:
        orig_ft, orig_lt = torch.cuda.FloatTensor, torch.LongTensor

        class _LongTensorShim:
            def __call__(self, x):
                if isinstance(x, list) and x and torch.is_tensor(x[0]):
                    return torch.cat([t.reshape(-1) for t in x]).long()
                return orig_lt(x)

        torch.cuda.FloatTensor = _FixedNoise(
            [z_f0 / 0.8, z_energy / 0.8, residual / 0.7])
        torch.LongTensor = _LongTensorShim()
        try:
            print("# running torch reference infer...", file=sys.stderr)
            with torch.no_grad():
                ref_out = ref.infer(
                    torch.tensor([0]), torch.from_numpy(text_np), sigma=0.7,
                    sigma_f0=0.8, sigma_energy=0.8, dur=dur.float())
        finally:
            torch.cuda.FloatTensor, torch.LongTensor = orig_ft, orig_lt
        ref_mel_np = ref_out["mel"].numpy()
        ref_f0_np = ref_out["f0"].numpy()
        if oracle_path:
            blob = {f"sd/{k}": v.detach().cpu().numpy()
                    for k, v in sd.items()}
            blob["mel"] = ref_mel_np
            blob["f0"] = ref_f0_np
            blob["version"] = np.asarray(ORACLE_VERSION)
            np.savez(oracle_path, **blob)
            print(f"# torch oracle cached to {oracle_path}",
                  file=sys.stderr)
    else:
        ref_mel_np = oracle["mel"]
        ref_f0_np = oracle["f0"]

    print("# running jax infer...", file=sys.stderr)
    out = radtts_infer(
        params, jax.random.PRNGKey(0), jnp.asarray([0]),
        jnp.asarray(text_np), 0.7, max_frames,
        dur=jnp.asarray(dur.numpy()).astype(jnp.int32),
        z_f0=jnp.asarray(z_f0.numpy().transpose(0, 2, 1)),
        z_energy=jnp.asarray(z_energy.numpy().transpose(0, 2, 1)),
        residual=jnp.asarray(residual.numpy().transpose(0, 2, 1)))

    mel_ref = ref_mel_np
    mel_ours = np.asarray(out["mel"]).transpose(0, 2, 1)
    mel_mae = float(np.abs(mel_ours - mel_ref).mean())
    f0_mae = float(np.abs(np.asarray(out["f0"]) - ref_f0_np).mean())
    print(json.dumps({
        "mel_mae": mel_mae,
        "f0_mae": f0_mae,
        "max_frames": max_frames,
        "n_tokens": int(N),
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "matmul_precision": os.environ.get("MATMUL_PRECISION", "default"),
        "pass": mel_mae < 1e-3,
    }))


if __name__ == "__main__":
    main()
