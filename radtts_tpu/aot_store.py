"""Serialized-executable store: skip tunnel compiles across processes.

bench.py proved the mechanism (bench.py get_runner): `jax.jit(fn).lower(
*args).compile()` once, `jax.experimental.serialize_executable.serialize`
the result to disk, and every later process `deserialize_and_load`s it in
<1 s instead of re-compiling through the tunneled TPU's remote compile
service (cold compiles measured 20 s - minutes per program, r03-r04).
This module is the reusable form of that store so the serving path
(synthesizer.py / serve.py) gets the same cold-start fix the bench got —
the reference pays a full model load + first-call compile per process
(reference: inference.py:80-156).

Keying discipline (same as bench.py `_code_fingerprint`): artifacts are
keyed by a fingerprint of the radtts_tpu package sources, the jax version,
the device kind, and any caller-supplied statics (model config, AMP mode,
...), PLUS the per-call argument signature (pytree structure + leaf
shape/dtype). Any code or config change produces new keys, so a stale
executable can never masquerade as current code.

Scope: the store activates only on TPU backends by default — XLA:CPU
executables embed host-ISA feature sets and reloading them on a different
host risks SIGILL (the cpu_aot_loader warnings the persistent compile
cache prints); set RADTTS_AOT_FORCE=1 to force-enable (tests do, same
process + same host)."""

import hashlib
import os
import pickle
import threading
import zlib

import jax

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def package_fingerprint(extra=()):
    """Hash of everything that shapes a traced program: jax version,
    device kind, every .py in radtts_tpu/, and caller statics."""
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    dev = jax.devices()[0]
    h.update(str(getattr(dev, "device_kind", dev.platform)).encode())
    for root, dirs, files in sorted(os.walk(_PKG_DIR)):
        dirs.sort()
        for fn in sorted(files):
            if fn.endswith(".py"):
                with open(os.path.join(root, fn), "rb") as f:
                    h.update(fn.encode())
                    h.update(f.read())
    for item in extra:
        h.update(repr(item).encode())
    return h.hexdigest()[:20]


def _arg_signature(args, kwargs):
    """Shape/dtype/structure key for one call: what jax.jit retraces on."""
    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
    sig = [str(treedef)]
    for leaf in leaves:
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            sig.append(f"{tuple(leaf.shape)}:{leaf.dtype}")
        else:
            sig.append(f"py:{leaf!r}")
    return hashlib.sha256("|".join(sig).encode()).hexdigest()[:16]


def store_enabled():
    if os.environ.get("RADTTS_AOT_FORCE") == "1":
        return True
    dev = jax.devices()[0]
    return (dev.platform == "tpu"
            or "TPU" in str(getattr(dev, "device_kind", "")))


class AOTStore:
    """Directory of zlib-compressed serialized executables.

    `wrap(name, jitted)` returns a drop-in callable: per argument
    signature it loads the stored executable if one exists, else
    compiles via lower().compile() and persists. Thread-safe per store
    (serve.py dispatches from worker threads)."""

    def __init__(self, directory, fingerprint, log=None):
        self.dir = directory
        self.fingerprint = fingerprint
        self._mem = {}
        self._lock = threading.Lock()
        self._log = log or (lambda msg: None)

    @classmethod
    def open(cls, directory, extra=(), log=None):
        """None when the store should not activate here (non-TPU backend
        without RADTTS_AOT_FORCE, or no directory given)."""
        if not directory or not store_enabled():
            return None
        return cls(directory, package_fingerprint(extra), log=log)

    def _path(self, key):
        return os.path.join(self.dir, f"{key}-{self.fingerprint}.aot")

    def _load(self, key):
        path = self._path(key)
        if not os.path.exists(path):
            return None
        try:
            with open(path, "rb") as f:
                blob = f.read()
            payload, in_tree, out_tree, n_dev = pickle.loads(
                zlib.decompress(blob))
            from jax.experimental.serialize_executable import \
                deserialize_and_load
            # deserialize_and_load defaults execution_devices to ALL
            # addressable devices — on a backend with more devices than
            # the executable's assignment (e.g. an 8-virtual-device CPU
            # mesh) the loaded program then demands 8 input shards. Pin
            # the device list the executable was compiled for.
            exe = deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:n_dev])
            self._log(f"aot[{key}]: loaded ({len(blob) / 1e6:.1f} MB)")
            return exe
        except Exception as exc:  # corrupt/incompatible -> recompile
            self._log(f"aot[{key}]: load failed ({exc!r}); compiling")
            return None

    @staticmethod
    def _n_devices(compiled):
        try:
            return len(compiled._executable.xla_executable.local_devices())
        except Exception:
            return 1

    def _save(self, key, compiled):
        try:
            from jax.experimental.serialize_executable import serialize
            os.makedirs(self.dir, exist_ok=True)
            payload, in_tree, out_tree = serialize(compiled)
            blob = zlib.compress(pickle.dumps(
                (payload, in_tree, out_tree,
                 self._n_devices(compiled))), 6)
            tmp = self._path(key) + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, self._path(key))
            self._log(f"aot[{key}]: persisted ({len(blob) / 1e6:.1f} MB)")
        except Exception as exc:  # persistence is an optimization
            self._log(f"aot[{key}]: serialize failed ({exc!r})")

    def get(self, name, jitted, args, kwargs=None):
        """The compiled executable for `jitted` at this signature."""
        kwargs = kwargs or {}
        key = f"{name}-{_arg_signature(args, kwargs)}"
        with self._lock:
            exe = self._mem.get(key)
            if exe is not None:
                return exe
            exe = self._load(key)
            if exe is None:
                exe = jitted.lower(*args, **kwargs).compile()
                self._save(key, exe)
            self._mem[key] = exe
            return exe

    def wrap(self, name, jitted):
        """Drop-in callable over `jitted` backed by the store."""

        def call(*args, **kwargs):
            return self.get(name, jitted, args, kwargs)(*args, **kwargs)

        return call
