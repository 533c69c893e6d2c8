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
    return REF
