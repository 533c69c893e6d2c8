"""Helpers to import the PyTorch reference (read-only, /root/reference) as a
parity oracle inside tests.

The reference imports numba/librosa/lmdb/matplotlib-pylab at module import
time; those aren't needed for CPU parity math, so we install minimal stubs
before putting the reference on sys.path.
"""

import sys
import types

REF = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_reference():
    if REF not in sys.path:
        # numba.jit used as decorator on mas_width1
        _stub("numba", jit=lambda *a, **k: (lambda f: f))
        # librosa bits used by audio_processing / data
        librosa = _stub("librosa")
        filters = _stub("librosa.filters")
        util = _stub("librosa.util")
        librosa.filters = filters
        librosa.util = util

        def _mel(sr, n_fft, n_mels, fmin, fmax):
            from radtts_tpu.data.mel_filters import mel_filterbank
            import numpy as np
            return np.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))

        filters.mel = _mel

        def _pad_center(x, size):
            import numpy as np
            n = len(x)
            lpad = (size - n) // 2
            return np.pad(x, (lpad, size - n - lpad))

        def _normalize(x, norm=None):
            import numpy as np
            if norm is None:
                return x
            return x / np.max(np.abs(x))

        def _tiny(x):
            import numpy as np
            return np.finfo(np.float32).tiny

        util.pad_center = _pad_center
        util.normalize = _normalize
        util.tiny = _tiny
        librosa.pyin = None
        _stub("lmdb")

        # inflect / unidecode backed by our own engines, so the reference
        # text frontend runs and exercises its orchestration logic
        class _InflectEngine:
            def number_to_words(self, num, andword="and", zero="zero",
                                group=0):
                from radtts_tpu.text.numwords import number_to_words
                return number_to_words(num, andword=andword, zero=zero,
                                       group=group)

        inflect_mod = _stub("inflect")
        inflect_mod.engine = lambda: _InflectEngine()

        from radtts_tpu.text.translit import transliterate
        unidecode_mod = _stub("unidecode")
        unidecode_mod.unidecode = transliterate

        sys.path.insert(0, REF)

        # The reference hardcodes torch.cuda.LongTensor in its mask builder
        # (common.py:95); patch a CPU equivalent for parity tests.
        import torch
        import common as ref_common

        def _mask_cpu(lengths):
            max_len = int(torch.max(lengths).item())
            ids = torch.arange(0, max_len, device=lengths.device)
            return (ids < lengths.unsqueeze(1)).bool()

        ref_common.get_mask_from_lengths = _mask_cpu

        # CPU-run the CUDA-hardcoded bits: noise tensors (radtts.py:559 etc.)
        # and the per-item MAS device round-trip (radtts.py:320-334).
        torch.cuda.FloatTensor = torch.FloatTensor
        torch.cuda.LongTensor = torch.LongTensor

        import numpy as _np
        import radtts as ref_radtts
        from alignment import mas_width1 as _ref_mas

        def _binarize_cpu(self, attn, in_lens, out_lens):
            b_size = attn.shape[0]
            with torch.no_grad():
                attn_cpu = attn.data.cpu().numpy()
                attn_out = torch.zeros_like(attn)
                for ind in range(b_size):
                    hard = _ref_mas(_np.asarray(
                        attn_cpu[ind, 0, : out_lens[ind], : in_lens[ind]],
                        dtype=_np.float64))
                    attn_out[ind, 0, : out_lens[ind], : in_lens[ind]] = (
                        torch.tensor(hard))
            return attn_out

        ref_radtts.RADTTS.binarize_attention = _binarize_cpu
    return REF


def converge_spectral_norms(model, n_iters=100):
    """Run the spectral-norm power iteration to convergence on every
    spectral-normed weight of a torch module.

    At random init, sigma = u^T W v is far from the true spectral norm (it
    can be near zero), making W/sigma huge and the LSTM chaotic — parity
    comparisons then amplify fp32 noise exponentially. Trained checkpoints
    don't have this problem (one iteration per training step)."""
    import torch
    import torch.nn.functional as F

    with torch.no_grad():
        for mod in model.modules():
            for buf_name, _ in list(mod.named_buffers(recurse=False)):
                if not buf_name.endswith("_u"):
                    continue
                base = buf_name[:-2]
                if not hasattr(mod, base + "_orig"):
                    continue
                w = getattr(mod, base + "_orig").detach()
                u = getattr(mod, base + "_u")
                v = getattr(mod, base + "_v")
                wm = w.reshape(w.shape[0], -1)
                for _ in range(n_iters):
                    v.copy_(F.normalize(wm.t() @ u, dim=0))
                    u.copy_(F.normalize(wm @ v, dim=0))
