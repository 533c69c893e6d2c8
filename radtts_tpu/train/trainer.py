"""Training loop: jitted DP train step over a jax.sharding Mesh, curriculum
flags, freeze/warmstart/resume, TensorBoard logging, validation with optional
audio sampling (behavior parity with reference train.py:43-455).

TPU design:
  * one jitted train step per (binarize, use_kl) curriculum combo; batch
    arrays are sharded over the 'data' mesh axis, params replicated — XLA
    inserts the gradient all-reduce over ICI (replaces the reference's
    hand-rolled NCCL hooks, distributed.py:101-153);
  * spectral-norm power iteration runs as a pure pre-grad tree update inside
    the step (same math as torch's in-forward update);
  * buffers (power-iteration vectors, LU permutation) are masked out of the
    optimizer.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radtts_tpu.losses import attention_binarization_loss, radtts_loss
from radtts_tpu.models.radtts import radtts_forward, radtts_init
from radtts_tpu.ops.lstm import spectral_norm_update
from radtts_tpu.train.checkpoint import (flat_dict_to_tree,
                                         load_any_radtts_checkpoint,
                                         load_checkpoint, save_checkpoint,
                                         tree_to_flat_dict, warmstart_filter)
from radtts_tpu.train.optim import build_optimizer


# ---------------------------------------------------------------------------
# trainable-parameter masking (reference: train.py:74-97 unfreeze_modules,
# train.py:332-338 finetune_layers)
# ---------------------------------------------------------------------------

_MODULE_SUBSTRINGS = {
    "dur": ("dur_pred_layer",),
    "f0": ("f0_pred_module",),
    "energy": ("energy_pred_module",),
    "vpred": ("v_pred_module", "v_embeddings"),
    "unvbias": ("unvoiced_bias",),
}

_BUFFER_MARKERS = ("/sn_u", "/sn_v")


def _is_buffer(path):
    if any(path.endswith(m) for m in _BUFFER_MARKERS):
        return True
    # LU permutation factor of invertible 1x1 convs
    if path.endswith("/p") and ("/inv/" in path or path.endswith("inv/p")):
        return True
    return False


def build_trainable_mask(params, unfreeze_modules="all", finetune_layers=()):
    flat = tree_to_flat_dict(params)
    allowed_prefixes = None
    if unfreeze_modules != "all":
        allowed_prefixes = []
        for key, prefixes in _MODULE_SUBSTRINGS.items():
            if key in unfreeze_modules:
                allowed_prefixes.extend(prefixes)

    mask = {}
    for path in flat:
        ok = not _is_buffer(path)
        if ok and allowed_prefixes is not None:
            ok = any(path.startswith(p) for p in allowed_prefixes)
        if ok and finetune_layers:
            ok = any(l in path for l in finetune_layers)
        mask[path] = ok
    return flat_dict_to_tree(
        jax.tree.map(lambda x: np.zeros((), bool), params),
        {k: np.array(v) for k, v in mask.items()})


def _apply_mask(tree, mask):
    return jax.tree.map(
        lambda x, m: jnp.where(m, x, jnp.zeros_like(x)), tree, mask)


# ---------------------------------------------------------------------------
# train step
# ---------------------------------------------------------------------------


def make_train_step(model_config, loss_weights, sigma, optimizer,
                    trainable_mask, donate=False, use_amp=False):
    """donate=True aliases params/opt_state buffers (saves HBM on a local
    runtime) but is OFF by default: on tunneled/remote TPU backends donation
    has been measured to serialize each step through the host link
    (~50 s/step vs 1.2 s/step undonated on a v5e tunnel).

    use_amp=True runs the WN/SimpleConvNet coupling predictor stacks in
    bfloat16 (activations + weights) with everything else — flow state,
    logdets, fp32 islands, losses, master params, optimizer — in fp32; the
    TPU equivalent of the reference's torch AMP autocast regions
    (train.py:364,416-422). bf16 needs no GradScaler."""
    from radtts_tpu.ops import amp as _amp

    n_group_size = model_config["n_group_size"]

    def loss_fn(params, batch, rng, binarize, use_kl):
        with _amp.scope(use_amp):
            out = radtts_forward(
                params, batch["mel"], batch["speaker_ids"], batch["text"],
                batch["input_lengths"], batch["output_lengths"],
                binarize_attention_flag=binarize,
                attn_prior=batch.get("attn_prior"), f0=batch.get("f0"),
                energy_avg=batch.get("energy_avg"),
                voiced_mask=batch.get("voiced_mask"),
                p_voiced=batch.get("p_voiced"), training=True,
                dropout_rng=rng)
        loss_dict = radtts_loss(
            out, batch["input_lengths"], batch["output_lengths"],
            sigma=sigma, n_group_size=n_group_size,
            dur_model_config=model_config.get("dur_model_config"),
            f0_model_config=model_config.get("f0_model_config"),
            energy_model_config=model_config.get("energy_model_config"),
            vpred_model_config=model_config.get("v_model_config"),
            loss_weights=loss_weights)
        total = 0.0
        for v, w in loss_dict.values():
            if w > 0:
                total = total + v * w
        w_bin = loss_weights.get("binarization_loss_weight", 1.0)
        if use_kl and binarize:
            bin_loss = attention_binarization_loss(out["attn"],
                                                   out["attn_soft"])
            total = total + bin_loss * w_bin
        else:
            bin_loss = jnp.zeros(())
        loss_dict = dict(loss_dict)
        loss_dict["binarization_loss"] = (bin_loss, w_bin)
        return total, loss_dict

    def train_step(params, opt_state, batch, rng, binarize, use_kl):
        params = spectral_norm_update(params)
        (total, loss_dict), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng, binarize, use_kl)
        grads = _apply_mask(grads, trainable_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = _apply_mask(updates, trainable_mask)
        params = optax.apply_updates(params, updates)
        grad_norm = optax.global_norm(grads)
        return params, opt_state, total, loss_dict, grad_norm

    return jax.jit(train_step, static_argnames=("binarize", "use_kl"),
                   donate_argnums=(0, 1) if donate else ())


def make_eval_step(model_config, loss_weights, sigma):
    n_group_size = model_config["n_group_size"]

    def eval_step(params, batch):
        out = radtts_forward(
            params, batch["mel"], batch["speaker_ids"], batch["text"],
            batch["input_lengths"], batch["output_lengths"],
            binarize_attention_flag=True,
            attn_prior=batch.get("attn_prior"), f0=batch.get("f0"),
            energy_avg=batch.get("energy_avg"),
            voiced_mask=batch.get("voiced_mask"),
            p_voiced=batch.get("p_voiced"), training=False)
        loss_dict = radtts_loss(
            out, batch["input_lengths"], batch["output_lengths"],
            sigma=sigma, n_group_size=n_group_size,
            dur_model_config=model_config.get("dur_model_config"),
            f0_model_config=model_config.get("f0_model_config"),
            energy_model_config=model_config.get("energy_model_config"),
            vpred_model_config=model_config.get("v_model_config"),
            loss_weights=loss_weights)
        scalars = {k: v for k, (v, _) in loss_dict.items()}
        return scalars, out["attn"], out["attn_soft"]

    return jax.jit(eval_step)


# ---------------------------------------------------------------------------
# data/device plumbing
# ---------------------------------------------------------------------------

_BATCH_KEYS = ("mel", "speaker_ids", "text", "input_lengths",
               "output_lengths", "attn_prior", "f0", "p_voiced",
               "voiced_mask", "energy_avg")


class MultiHostStepRunner:
    """Compile-before-execute wrapper for multi-host runs.

    The first execution of each compiled program initializes that
    program's CPU-collectives (Gloo) context, whose key-value rendezvous
    carries a ~30 s deadline — while ranks' first-call compile times can
    skew by minutes (measured 22 s vs 100 s when one rank hits the
    persistent compilation cache and another misses). For every new
    argument signature this wrapper AOT-compiles on each rank, joins a
    named barrier, and only then executes, so all ranks enter the
    rendezvous together. Single-process runs pass straight through to the
    jitted callable."""

    def __init__(self, jitted, name, n_static_tail=0, sig_argnums=None):
        self.jitted = jitted
        self.name = name
        # trailing static args (static_argnames) go to lower() but must be
        # OMITTED when calling the compiled executable (they are baked in)
        self.n_static_tail = n_static_tail
        # which argument positions can actually vary (e.g. the batch and
        # the curriculum flags): flattening the whole params + optimizer
        # pytree per step just to build a dict key is wasted host time
        self.sig_argnums = sig_argnums
        self.aot = {}

    @staticmethod
    def _sig(args):
        out = []
        for leaf in jax.tree.leaves(args):
            if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
                out.append((tuple(leaf.shape), str(leaf.dtype)))
            else:
                out.append(("py", repr(leaf)))
        return tuple(out)

    def __call__(self, *args):
        if jax.process_count() == 1:
            return self.jitted(*args)
        sig = self._sig(args if self.sig_argnums is None
                        else tuple(args[i] for i in self.sig_argnums))
        fn = self.aot.get(sig)
        if fn is None:
            from jax.experimental import multihost_utils
            fn = self.jitted.lower(*args).compile()
            multihost_utils.sync_global_devices(
                f"{self.name}/{len(self.aot)}")
            self.aot[sig] = fn
        if self.n_static_tail:
            args = args[:len(args) - self.n_static_tail]
        return fn(*args)


def make_mesh(devices=None, n_model=1):
    """dp(×tp) mesh for the training loop.

    Delegates to parallel.mesh.make_mesh so the trainer, the driver dryrun
    (__graft_entry__.dryrun_multichip) and tests/test_parallel.py all build
    the same ('data', 'model') mesh; n_model=1 degenerates to pure DP (the
    reference's only strategy, distributed.py:101-153)."""
    from radtts_tpu.parallel.mesh import make_mesh as _make_mesh
    devices = np.array(devices if devices is not None else jax.devices())
    return _make_mesh(n_data=devices.size // n_model, n_model=n_model,
                      devices=devices)


def shard_batch(batch, mesh):
    """Place batch arrays sharded over the 'data' mesh axis.

    Remainder batches (e.g. the last validation batch when len(valset) is
    not a device multiple — reference uses DistributedSampler padding,
    train.py:147-149) are wrap-padded by repeating rows so the leading dim
    divides the mesh; the duplicated rows only affect per-batch logging
    means, never gradients (training uses drop_last=True).

    In a multi-host run each process holds only its local slice of the
    global batch; jax.make_array_from_process_local_data assembles the
    global sharded array from the per-host shards.
    """
    sharded = {}
    batch_sharding = NamedSharding(mesh, P("data"))
    n_data = mesh.shape.get("data", 1)
    multi_host = jax.process_count() > 1
    if multi_host:
        # each process collated its own local rows, so the padded text /
        # frame buckets can DIFFER across ranks — and
        # make_array_from_process_local_data requires identical local
        # shapes. Sync every rank to the global max bucket (extra zero
        # columns match DataCollate's padding; lengths arrays keep the true
        # values, so masking makes the padding inert).
        from jax.experimental import multihost_utils
        n_loc = (np.asarray(batch["text"]).shape[1]
                 if batch.get("text") is not None else 0)
        t_loc = (np.asarray(batch["mel"]).shape[1]
                 if batch.get("mel") is not None else 0)
        gdims = np.asarray(multihost_utils.process_allgather(
            np.asarray([n_loc, t_loc], np.int64))).reshape(-1, 2)
        n_g, t_g = int(gdims[:, 0].max()), int(gdims[:, 1].max())
        _grow = {"text": (n_g,), "mel": (t_g, None), "attn_prior":
                 (t_g, n_g), "f0": (t_g,), "p_voiced": (t_g,),
                 "voiced_mask": (t_g,), "energy_avg": (t_g,)}

        def _pad_to_global(k, v):
            targets = _grow.get(k)
            if targets is None:
                return v
            pads = [(0, 0)]
            for axis, tgt in enumerate(targets, start=1):
                pads.append((0, 0) if tgt is None
                            else (0, tgt - v.shape[axis]))
            return np.pad(v, pads) if any(p[1] for p in pads) else v
    b = None
    reps = None
    for k in _BATCH_KEYS:
        v = batch.get(k)
        if v is None:
            continue
        v = np.asarray(v)
        if multi_host:
            v = _pad_to_global(k, v)
        if b is None:
            b = v.shape[0]
            local_mult = (n_data // jax.process_count() if multi_host
                          else n_data)
            local_mult = max(local_mult, 1)
            pad = (-b) % local_mult
            if pad:
                reps = np.arange(b + pad) % b
        if reps is not None:
            v = v[reps]
        if multi_host:
            sharded[k] = jax.make_array_from_process_local_data(
                batch_sharding, v)
        else:
            sharded[k] = jax.device_put(jnp.asarray(v), batch_sharding)
    return sharded


# ---------------------------------------------------------------------------
# main training entry (reference: train.py:300-455)
# ---------------------------------------------------------------------------


def _snapshot_code(output_directory):
    """Reproducibility record: tar the framework sources into the run dir
    (reference: `tar -czvf code.tar.gz *.py`, train.py:60-66)."""
    import tarfile

    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    out = os.path.join(output_directory, "code.tar.gz")
    try:
        with tarfile.open(out, "w:gz") as tar:
            for name in sorted(os.listdir(repo)):
                if name.endswith(".py"):
                    tar.add(os.path.join(repo, name), arcname=name)
            pkg = os.path.join(repo, "radtts_tpu")
            if os.path.isdir(pkg):
                tar.add(pkg, arcname="radtts_tpu",
                        filter=lambda ti: None
                        if "__pycache__" in ti.name else ti)
    except OSError as exc:
        print("code snapshot skipped:", exc)


def prepare_output_folder(output_directory, config):
    os.makedirs(output_directory, exist_ok=True)
    with open(os.path.join(output_directory, "config.json"), "w") as f:
        json.dump(config, f, indent=4)
    _snapshot_code(output_directory)
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(os.path.join(output_directory, "logs"))
    except ImportError:
        return None


def train(config, output_directory, epochs, optim_algo, learning_rate,
          weight_decay, sigma, iters_per_checkpoint, batch_size, seed,
          checkpoint_path, ignore_layers, ignore_layers_warmstart,
          include_layers, finetune_layers, warmstart_checkpoint_path,
          use_amp, grad_clip_val, loss_weights, binarization_start_iter=-1,
          kl_loss_start_iter=-1, unfreeze_modules="all", log_interval=1,
          profile_dir="", profile_start_iter=5, profile_n_iters=5,
          optim_state_dtype="", **kwargs):
    """use_amp=true runs the coupling predictor conv stacks in bfloat16
    (see make_train_step) — the TPU analogue of the reference's AMP
    autocast; fp32 stays pinned on the reference's autocast-false islands
    (invertible 1x1s, text encoder) either way, and bf16 needs no loss
    scaler, so there is no GradScaler equivalent.

    log_interval > 1 skips the per-iteration scalar host syncs on all but
    every Nth step (each float() costs a full host round trip on tunneled
    backends). profile_dir enables a jax.profiler trace of steps
    [profile_start_iter, profile_start_iter + profile_n_iters) viewable in
    TensorBoard / Perfetto — the reference's only tracing was a wall-clock
    print (reference: train.py:383,424-427)."""
    import hashlib

    from radtts_tpu.data.dataset import DataCollate, DataLoader

    data_config = config["data_config"]
    model_config = config["model_config"]
    train_config = config["train_config"]

    if seed is None:
        seed = int(hashlib.md5(
            output_directory.encode()).hexdigest(), 16) % 2000
    print(f"Using seed {seed}")

    # dist_config.n_model > 1 enables tensor parallelism over the WN
    # coupling hidden channels in addition to data parallelism (the
    # reference's CLI only reaches DP, distributed.py:48-64; here
    # `-p dist_config.n_model=2` shards the decoder too)
    n_model = int(config.get("dist_config", {}).get("n_model", 1))
    n_devices = len(jax.devices())
    assert n_devices % n_model == 0, (
        f"n_model {n_model} does not divide {n_devices} devices")
    mesh = make_mesh(n_model=n_model)
    n_data = mesh.shape["data"]
    if n_model > 1:
        print(f"> mesh: data={n_data} x model={n_model}")
    assert batch_size % n_data == 0 or n_data == 1, (
        f"batch_size {batch_size} not divisible by {n_data} data shards")

    # multi-host: each process loads a disjoint dataset shard (reference:
    # DistributedSampler, train.py:147-149) and only rank 0 logs/checkpoints
    # (reference: train.py:439-453)
    process_rank = jax.process_index()
    n_process = jax.process_count()
    is_rank0 = process_rank == 0
    if n_process > 1:
        print(f"> multi-host: process {process_rank}/{n_process}, "
              f"{len(jax.local_devices())} local / {n_devices} global "
              f"devices")

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = radtts_init(init_rng, model_config)

    # train_config.optim_state_dtype="bfloat16" halves the RAdam moment
    # trees' HBM bytes — the optimizer pass is HBM-bound (docs/DESIGN §9)
    optimizer = build_optimizer(optim_algo, learning_rate, weight_decay,
                                grad_clip_val,
                                state_dtype=optim_state_dtype or None)
    trainable_mask = build_trainable_mask(params, unfreeze_modules,
                                          finetune_layers)
    opt_state = optimizer.init(params)

    iteration = 0
    if warmstart_checkpoint_path:
        params = warmstart(warmstart_checkpoint_path, params, model_config,
                           include_layers, ignore_layers_warmstart)
    if checkpoint_path:
        params, opt_state_l, meta = resume(checkpoint_path, params,
                                           opt_state, model_config)
        if opt_state_l is not None:
            opt_state = opt_state_l
        iteration = meta["iteration"] + 1

    # place params/optimizer on the mesh: TP rules shard the WN stacks when
    # n_model > 1, everything else (and the n_model == 1 case) replicates
    from radtts_tpu.parallel.mesh import param_shardings
    params = jax.device_put(params, param_shardings(params, mesh))
    opt_state = jax.device_put(opt_state,
                               param_shardings(opt_state, mesh))

    train_step = make_train_step(model_config, loss_weights, sigma,
                                 optimizer, trainable_mask,
                                 use_amp=bool(use_amp))
    # built ONCE: rebuilding per validation would re-trace + recompile the
    # whole eval graph at every checkpoint (expensive on tunneled backends)
    eval_step = make_eval_step(model_config, loss_weights, sigma)
    if n_process > 1:
        # every rank compiles a new signature BEFORE any rank executes it
        # (Gloo rendezvous deadline vs compile skew — see the class doc)
        train_step = MultiHostStepRunner(train_step, "train_step",
                                         n_static_tail=2,
                                         sig_argnums=(2, 4, 5))
        eval_step = MultiHostStepRunner(eval_step, "eval_step",
                                        sig_argnums=(1,))

    from radtts_tpu.data.dataset import data_factory
    trainset = data_factory(data_config, "training_files")
    valset = data_factory(data_config, "validation_files",
                          trainset.speaker_ids)
    collate_fn = DataCollate()
    # num_worker_procs > 0: fetch samples in worker PROCESSES (reference
    # uses 8, train.py:151-154) — first-epoch pyin cache misses are
    # GIL-bound, so threads alone cannot parallelize a cold epoch
    num_worker_procs = int(kwargs.get("num_worker_procs", 0))
    train_loader = DataLoader(
        trainset, batch_size, collate_fn, shuffle=True, seed=seed,
        rank=process_rank, world_size=n_process,
        num_worker_procs=num_worker_procs,
        worker_init=(data_factory, (data_config, "training_files",
                                    trainset.speaker_ids)))

    logger = (prepare_output_folder(output_directory, config)
              if is_rank0 else None)

    epoch_offset = max(0, iteration // max(len(train_loader), 1))
    for epoch in range(epoch_offset, epochs):
        train_loader.set_epoch(epoch)
        print(f"Epoch: {epoch}")
        for batch in train_loader:
            tic = time.time()
            binarize = iteration >= binarization_start_iter
            use_kl = binarize and iteration >= kl_loss_start_iter
            rng, step_rng = jax.random.split(rng)
            sharded = shard_batch(batch, mesh)

            if profile_dir and iteration == profile_start_iter:
                jax.profiler.start_trace(profile_dir)
            params, opt_state, total, loss_dict, grad_norm = train_step(
                params, opt_state, sharded, step_rng, binarize, use_kl)
            if (profile_dir
                    and iteration == profile_start_iter + profile_n_iters):
                jax.tree.map(lambda x: x.block_until_ready(), total)
                jax.profiler.stop_trace()
                print(f"profiler trace written to {profile_dir}")

            if iteration % max(log_interval, 1) == 0:
                # ONE batched host transfer for all logged scalars (a
                # float() per key costs a full round trip each on
                # tunneled backends)
                fetched = jax.device_get(
                    {"_total": total, "_grad_norm": grad_norm,
                     **{k: v for k, (v, _) in loss_dict.items()}})
                total = float(fetched.pop("_total"))
                grad_norm_f = float(fetched.pop("_grad_norm"))
                toc = time.time()
                print_list = [f"iter: {iteration}  ({toc - tic:.2f} s)  |  "
                              f"lr: {learning_rate}"]
                for k in loss_dict:
                    v = float(fetched[k])
                    print_list.append(f"  |  {k}: {v:.3f}")
                    if logger is not None:
                        logger.add_scalar("train/" + k, v, iteration)
                if logger is not None:
                    logger.add_scalar("train/grad_norm", grad_norm_f,
                                      iteration)
                print("".join(print_list), flush=True)

            if iteration > -1 and iteration % iters_per_checkpoint == 0:
                val_losses = compute_validation_loss(
                    iteration, params, model_config, loss_weights, sigma,
                    valset, collate_fn, batch_size, mesh, logger=logger,
                    train_config=train_config,
                    sampling_rate=data_config["sampling_rate"],
                    eval_step=eval_step)
                if is_rank0:
                    ckpt = os.path.join(output_directory,
                                        f"model_{iteration}")
                    save_checkpoint(ckpt, params, opt_state, iteration,
                                    learning_rate)
                print("Validation loss:", val_losses)
            iteration += 1
    return params


def warmstart(path, params, model_config, include_layers=(),
              ignore_layers_warmstart=()):
    """Partial load with substring filters (reference: train.py:159-176)."""
    loaded, _ = load_any_radtts_checkpoint(path, model_config, params)
    flat = tree_to_flat_dict(loaded)
    filt = warmstart_filter(include_layers, ignore_layers_warmstart)
    params = flat_dict_to_tree(params, flat, strict=False, filter_fn=filt)
    print(f"Warm started from {path}")
    return params


def resume(path, params, opt_state, model_config):
    from radtts_tpu.train.checkpoint import is_torch_checkpoint
    if is_torch_checkpoint(path):
        params, meta = load_any_radtts_checkpoint(path, model_config, params)
        return params, None, meta
    params, opt_state, meta = load_checkpoint(path, params, opt_state)
    print(f"Loaded checkpoint '{path}' (iteration {meta['iteration']})")
    return params, opt_state, meta


def compute_validation_loss(iteration, params, model_config, loss_weights,
                            sigma, valset, collate_fn, batch_size, mesh,
                            logger=None, train_config=None,
                            sampling_rate=22050, eval_step=None):
    """(reference: train.py:200-297) full-val-set losses under binarized
    attention; attention images + optional audio samples to TensorBoard.

    Pass a prebuilt eval_step (train() does) so repeated validations reuse
    one jitted function instead of re-tracing every checkpoint."""
    from radtts_tpu.data.dataset import DataLoader

    if eval_step is None:
        eval_step = make_eval_step(model_config, loss_weights, sigma)
    val_loader = DataLoader(valset, batch_size, collate_fn, shuffle=False,
                            drop_last=False)
    totals = {}
    n_batches = max(len(val_loader), 1)
    attn = attn_soft = None
    last_batch = None
    for batch in val_loader:
        sharded = shard_batch(batch, mesh)
        scalars, attn, attn_soft = eval_step(params, sharded)
        # accumulate DEVICE scalars: a float() here would host-sync every
        # loss key every batch (0.7 ms – 1 s per sync on tunneled backends)
        for k, v in scalars.items():
            totals[k] = v if k not in totals else totals[k] + v
        last_batch = batch
    totals = {k: float(v) / n_batches
              for k, v in zip(totals, jax.device_get(list(totals.values())))}

    if logger is not None:
        for k, v in totals.items():
            logger.add_scalar("val/" + k, v, iteration)
        if attn is not None and last_batch is not None:
            from radtts_tpu.plotting import plot_alignment_to_numpy
            audioname = os.path.basename(last_batch["audiopaths"][0])
            logger.add_image(
                "attention_weights",
                plot_alignment_to_numpy(
                    np.asarray(attn_soft)[0].T, title=audioname),
                iteration, dataformats="HWC")
            logger.add_image(
                "attention_weights_mas",
                plot_alignment_to_numpy(np.asarray(attn)[0].T,
                                        title=audioname),
                iteration, dataformats="HWC")
        if train_config is not None:
            _log_audio_samples(iteration, params, model_config,
                               train_config, last_batch, attn, logger,
                               sampling_rate)
    return totals


def _log_audio_samples(iteration, params, model_config, train_config,
                       batch, attn, logger, sampling_rate):
    """Synthesize samples at several attribute sigmas through the vocoder
    (reference: train.py:247-295). Skipped when no vocoder is configured."""
    voc_ckpt = train_config.get("vocoder_checkpoint_path", "")
    voc_cfg = train_config.get("vocoder_config_path", "")
    if not (voc_ckpt and voc_cfg and os.path.exists(voc_ckpt)
            and os.path.exists(voc_cfg)):
        return
    try:
        from radtts_tpu.models.radtts import (is_attribute_unconditional,
                                              radtts_infer)
        from radtts_tpu.vocoder_io import load_vocoder

        vocoder, denoiser = load_vocoder(voc_ckpt, voc_cfg)
        attribute_sigmas = []
        if train_config.get("log_decoder_samples"):
            attribute_sigmas.append(-1)
        if train_config.get("log_attribute_samples"):
            if is_attribute_unconditional(params["_meta"]):
                attribute_sigmas.extend([1.0])
            else:
                attribute_sigmas.extend([0.1, 0.5, 0.8, 1.0])
        if not attribute_sigmas:
            return
        durations = np.asarray(attn)[0].sum(0)
        durations = np.floor(durations + 0.5).astype(np.int32)
        g = model_config["n_group_size"]
        total = int(durations.sum())
        max_frames = ((total + 16 * g - 1) // (16 * g)) * 16 * g

        def _gt_frames(key):
            # the batch's padded T can be shorter than max_frames (which is
            # rounded up to a 16*group multiple); zero-pad — frames past
            # `total` are sliced off the mel before vocoding anyway
            arr = np.asarray(batch[key][:1])
            if arr.shape[1] < max_frames:
                arr = np.pad(arr, ((0, 0), (0, max_frames - arr.shape[1])))
            return jnp.asarray(arr[:, :max_frames])

        from radtts_tpu.models.hifigan import (denoiser_apply,
                                               hifigan_generator_apply)
        for attribute_sigma in attribute_sigmas:
            try:
                kwargs = {}
                if attribute_sigma <= 0:
                    kwargs = dict(f0=_gt_frames("f0"),
                                  energy_avg=_gt_frames("energy_avg"),
                                  voiced_mask=_gt_frames("voiced_mask"))
                else:
                    kwargs = dict(sigma_f0=attribute_sigma,
                                  sigma_energy=attribute_sigma)
                out = radtts_infer(
                    params, jax.random.PRNGKey(iteration),
                    jnp.asarray(batch["speaker_ids"][:1]),
                    jnp.asarray(batch["text"][:1]), 0.8, max_frames,
                    dur=jnp.asarray(durations)[None], **kwargs)
                mel = out["mel"][:, :total]
                audio = hifigan_generator_apply(vocoder, mel)
                audio = denoiser_apply(denoiser, audio, strength=1e-5)
                audio = np.asarray(audio)[0]
                audio = audio / max(np.abs(audio).max(), 1e-5)
                tag = ("decoder_sample_gt_attributes"
                       if attribute_sigma < 0 else
                       f"sample_attribute_sigma_{attribute_sigma}")
                logger.add_audio(tag, audio, iteration, sampling_rate)
            except Exception as exc:  # instability guard (train.py:282-284)
                print("Instability or issue occured during inference, "
                      "skipping sample generation for TB logger", exc)
                continue
    except Exception as exc:
        print("vocoder logging skipped:", exc)
