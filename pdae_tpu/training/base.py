"""Base trainer: run-dir layout, config snapshot, data plumbing, logging,
checkpoint cadence, and the step-driver loop.

Equivalent of ``/root/reference/trainer/base_trainer.py`` redesigned for a
single-controller JAX world: no process groups or barriers -- one python
process per host drives all local chips through GSPMD; the train step is a
single jitted program (model fwd+bwd+adam+EMA); the host loop only moves
data and handles IO.

Run dir layout mirrors the reference (``checkpoints/``, ``samples/``,
``tb/``, config snapshot -- base_trainer.py:42-45).  Phase wall-time meters
("load data" / "step" / "log") follow the reference's per-phase meters
(train_regular_diffusion.py:62-123), with the caveat that a fused jit step
cannot attribute forward/backward separately -- use ``jax.profiler`` traces
(``profile_dir``) for intra-step attribution.
"""

from __future__ import annotations

import collections
import json
import os
import signal
import time
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np

from ..data import Loader, build_dataset, prefetch_to_device
from ..parallel import data_sharding, is_primary, make_mesh, replicated
from ..utils import (load_checkpoint, load_yaml, save_checkpoint, save_yaml,
                     snapshot_path)
from ..utils.config import overlay_eval_dataset_config


def _ours_ckpt_dir(p: str) -> bool:
    """A directory we may replace during a format switch: a valid sharded
    checkpoint, OR a torn one (shard files but the manifest never landed
    -- e.g. a crash inside the very first sharded save), OR empty.
    Anything with unrecognized content is NOT ours and must not be
    deleted."""
    from ..utils import is_sharded_checkpoint
    if is_sharded_checkpoint(p):
        return True
    try:
        entries = os.listdir(p)
    except OSError:
        return False
    return all(e == "manifest.msgpack" or e.endswith(".tmp")
               or (e.startswith("shard-") and e.endswith(".msgpack"))
               for e in entries)


class Meters:
    def __init__(self):
        self.totals = collections.defaultdict(float)
        self.counts = collections.defaultdict(int)

    def add(self, name, dt):
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self):
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()


class Logger:
    """Rank-0 logging: TensorBoard (if available) + metrics.jsonl."""

    def __init__(self, run_path: str, enabled: bool, purge_step: int = 0):
        self.enabled = enabled
        self._tb = None
        self._jsonl = None
        if not enabled:
            return
        os.makedirs(os.path.join(run_path, "tb"), exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(os.path.join(run_path, "tb"),
                                     purge_step=purge_step)
        except Exception:
            self._tb = None
        self._jsonl = open(os.path.join(run_path, "metrics.jsonl"), "a")

    def scalars(self, step: int, values: Dict[str, float]):
        if not self.enabled:
            return
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, v, step)
        self._jsonl.write(json.dumps({"step": step, **values}) + "\n")
        self._jsonl.flush()

    def image(self, step: int, name: str, img_hwc_uint8: np.ndarray):
        if not self.enabled or self._tb is None:
            return
        self._tb.add_image(name, img_hwc_uint8, step, dataformats="HWC")


class BaseTrainer:
    """Drive a jitted train step over an infinite sharded batch stream."""

    def __init__(self, config: Optional[dict] = None,
                 config_path: Optional[str] = None,
                 run_path: str = "./runs/dev",
                 resume: Optional[str] = None,
                 seed: int = 0):
        assert config is not None or config_path is not None
        self.config = config if config is not None else load_yaml(config_path)
        self.run_path = run_path
        self.seed = seed
        self.resume = resume

        self.runner_config = self.config["runner_config"]
        self.dataloader_config = self.config.get("dataloader_config", {})

        os.makedirs(os.path.join(run_path, "checkpoints"), exist_ok=True)
        os.makedirs(os.path.join(run_path, "samples"), exist_ok=True)
        if is_primary():
            save_yaml(self.config, os.path.join(run_path, "config.yml"))

        # param placement: 'replicated' (reference-DDP-equivalent, default),
        # 'fsdp' (ZeRO-3: params/EMA/opt-state sharded over the data axis,
        # all-gathered per use by GSPMD), 'tp' (tensor parallel:
        # channel-sharded params over a [data, model] mesh, activations
        # split too) or 'sp' (spatial parallel: params replicated,
        # activations H-sharded over a [data, sp] mesh -- GSPMD
        # halo-exchange convs; the axis that scales *resolution*, where
        # activation memory dominates).  Composed modes 'fsdp+tp' and
        # 'fsdp+sp' additionally shard params/EMA/opt-state over the data
        # axis of the same 2-D mesh when both memory regimes bind (params
        # AND activations).  None of the sharded modes has a reference
        # counterpart (SURVEY.md §2.3: DP only)
        self.param_sharding = self.runner_config.get(
            "param_sharding", "replicated")
        if self.param_sharding not in ("replicated", "fsdp", "tp", "sp",
                                       "fsdp+tp", "fsdp+sp"):
            raise ValueError(f"runner_config.param_sharding must be one of "
                             f"'replicated', 'fsdp', 'tp', 'sp', 'fsdp+tp', "
                             f"'fsdp+sp', got {self.param_sharding!r}")
        # which spaces the mode shards: params (fsdp/tp in any combination)
        # and/or activations (tp channel-wise, sp height-wise)
        self._mode_parts = set(self.param_sharding.split("+"))
        self._params_sharded = bool(self._mode_parts & {"fsdp", "tp"})
        # 'full' = one msgpack file from the primary (reference-shaped;
        # sharded modes all-gather first).  'sharded' = every process
        # writes its own replica-0 shards, no gather
        # (utils/sharded_checkpoint.py); load_checkpoint reads both.
        self.checkpoint_format = self.runner_config.get(
            "checkpoint_format", "full")
        if self.checkpoint_format not in ("full", "sharded"):
            raise ValueError(f"runner_config.checkpoint_format must be "
                             f"'full' or 'sharded', got "
                             f"{self.checkpoint_format!r}")
        # mesh layout: 'auto' = hierarchical [dcn, ici] when FSDP spans
        # multiple processes with >1 local chip each (params then shard
        # over ICI only and the per-use all-gathers never cross the slow
        # inter-host links), flat 1-D otherwise.  'flat'/'hier' force it;
        # hier_shape: [rows, cols] models a host grid in single-process
        # tests.  TP always uses its own [data, model] mesh with
        # tp_size chips per model-parallel group.
        layout = self.runner_config.get("mesh_layout", "auto")
        if layout not in ("auto", "flat", "hier"):
            raise ValueError(f"runner_config.mesh_layout must be 'auto', "
                             f"'flat' or 'hier', got {layout!r}")
        hier_shape = self.runner_config.get("hier_shape")
        if layout == "auto":
            layout = ("hier" if (self.param_sharding == "fsdp"
                                 and jax.process_count() > 1
                                 and len(jax.local_devices()) > 1)
                      else "flat")
        if "tp" in self._mode_parts:
            if layout == "hier":
                raise ValueError("mesh_layout 'hier' applies to fsdp; "
                                 "tp builds its own [data, model] mesh")
            from ..parallel import DATA_AXIS, make_tp_mesh
            self.mesh = make_tp_mesh(int(self.runner_config.get(
                "tp_size", len(jax.devices()))))
            # composed fsdp+tp additionally shards params over DATA_AXIS
            self.fsdp_axis = (DATA_AXIS if "fsdp" in self._mode_parts
                              else None)
        elif "sp" in self._mode_parts:
            if layout == "hier":
                raise ValueError("mesh_layout 'hier' applies to fsdp; "
                                 "sp builds its own [data, sp] mesh")
            from ..parallel import DATA_AXIS, make_sp_mesh
            self.mesh = make_sp_mesh(int(self.runner_config.get(
                "sp_size", len(jax.devices()))))
            # composed fsdp+sp shards params over DATA_AXIS (implicitly
            # replicated across the spatial groups, which share them)
            self.fsdp_axis = (DATA_AXIS if "fsdp" in self._mode_parts
                              else None)
        elif layout == "hier":
            from ..parallel import ICI_AXIS, make_hier_mesh
            self.mesh = make_hier_mesh(
                tuple(hier_shape) if hier_shape else None)
            self.fsdp_axis = ICI_AXIS
        else:
            from ..parallel import DATA_AXIS
            self.mesh = make_mesh()
            self.fsdp_axis = DATA_AXIS
        self.batch_sharding = data_sharding(self.mesh)
        self.replicated = replicated(self.mesh)
        # leaves smaller than this stay replicated in fsdp/tp mode
        self.fsdp_min_size = int(self.runner_config.get(
            "fsdp_min_size", 2 ** 15))
        # optional jax.profiler trace dir (reference uses wall-clock phase
        # meters only, SURVEY.md §5; we add real tracing)
        self.profile_dir = self.runner_config.get("profile_dir")

        self._build_datasets()
        self._build()          # subclass: models/state/step_fn
        self._place_state()
        self._enforce_state_sharding()

        self.start_step = 0
        latest = os.path.join(run_path, "checkpoints", "latest.ckpt")
        if resume:
            path = resume if os.path.exists(resume) else latest
            if not os.path.exists(path) and os.path.exists(path + ".swap"):
                # a sharded->full format switch crashed between dropping
                # the old directory and swapping the new file in; the
                # .swap sibling IS the completed new checkpoint
                os.replace(path + ".swap", path)
            raw = load_checkpoint(path)
            self.load_state_dict(raw)
            self.start_step = int(raw["step"])
            self._place_state()   # restored leaves are host arrays
        self.logger = Logger(run_path, enabled=is_primary(),
                             purge_step=self.start_step)

    # -- data ----------------------------------------------------------- #

    def _build_datasets(self):
        self.train_dataset = build_dataset(self.config["train_dataset_config"])
        eval_cfg = overlay_eval_dataset_config(self.config)
        self.eval_dataset = build_dataset(eval_cfg)
        dl = self.dataloader_config.get("train", {})
        # effective per-step batch = batch_size * num_iterations (grad accum,
        # reference train_regular_diffusion.py:72-97)
        self.micro_batch = int(dl.get("batch_size", 32))
        self.num_iterations = int(self.runner_config.get("num_iterations", 1))
        self.loader = Loader(
            self.train_dataset,
            batch_size=self.micro_batch * self.num_iterations,
            shuffle=True, seed=self.seed,
            num_workers=int(dl.get("num_workers", 4)))
        # device-resident corpus: HBM-resident arrays + on-device index
        # sampling, zero per-step host->device transfer (training/resident.py)
        self.device_resident = bool(
            self.config["train_dataset_config"].get("device_resident", False))
        # 'epoch' = the host loader's exact index stream (bitwise-equal
        # batches, ~25 KB of indices per dispatch); 'uniform' = in-jit
        # with-replacement draws (zero per-step host bytes)
        self.resident_sampling = str(
            self.config["train_dataset_config"].get("resident_sampling",
                                                    "epoch"))
        if self.resident_sampling not in ("epoch", "uniform"):
            raise ValueError(
                f"train_dataset_config.resident_sampling must be 'epoch' or "
                f"'uniform', got {self.resident_sampling!r}")

    def _step_batch_keys(self):
        """Batch keys the jitted train step consumes (None = all).  The
        iterators drop every other key BEFORE host->device transfer: the
        loaders' ``gts``/``idx`` are eval/debug-only, and on a
        transfer-bound host (PERF.md "The REAL stage-3 loop") dead bytes
        are wall-clock.  Filtering never changes the batch STREAM, so
        bitwise-deterministic resume is unaffected."""
        return None

    def _filter_batch_keys(self, it: Iterator[dict]) -> Iterator[dict]:
        keys = self._step_batch_keys()
        if keys is None:
            return it
        keep = tuple(keys)

        def gen():
            for b in it:
                yield {k: b[k] for k in keep if k in b}

        return gen()

    def _batch_iterator(self, start_step: int = 0) -> Iterator[dict]:
        """Batch stream, fast-forwarded so step N always consumes the batch
        an uninterrupted run would (bitwise-deterministic resume; the
        reference restarts its data cycle on --resume,
        base_trainer.py:112-125, so its resumed runs repeat data)."""
        epoch, offset = divmod(start_step, self.loader.batches_per_epoch())
        return prefetch_to_device(
            self._filter_batch_keys(
                self.loader.infinite(start_epoch=epoch, skip_batches=offset)),
            size=2, sharding=self.batch_sharding)

    # -- param placement --------------------------------------------------- #

    def _tree_shardings(self, tree):
        """Per-leaf NamedShardings for the current param_sharding mode
        (fsdp / tp / fsdp+tp / fsdp+sp); None when params are replicated
        ('replicated' and pure 'sp' -- out_shardings left to the compiler,
        matching round-1 behavior)."""
        if self.param_sharding == "fsdp+tp":
            from ..parallel import fsdp_tp_shardings
            return fsdp_tp_shardings(self.mesh, tree,
                                     min_size=self.fsdp_min_size)
        if "fsdp" in self._mode_parts:  # 'fsdp' and 'fsdp+sp'
            from ..parallel import fsdp_shardings
            return fsdp_shardings(self.mesh, tree, axis_name=self.fsdp_axis,
                                  min_size=self.fsdp_min_size)
        if self.param_sharding == "tp":
            from ..parallel import tp_shardings
            return tp_shardings(self.mesh, tree,
                                min_size=self.fsdp_min_size)
        return None

    def _place_state(self):
        """Lay the train state out over the mesh: every chip holds a full
        replica ('replicated', the reference's DDP memory model) or a 1/Nth
        shard of every large leaf ('fsdp'/'tp')."""
        self.state = self._place_frozen(self.state)

    def _place_frozen(self, tree):
        """Placement for any param tree including frozen (never-updated)
        stage params -- these are the biggest memory consumers in the
        PDAE/latent/manipulation stages, so the sharded modes shard them
        too."""
        sh = self._tree_shardings(tree)
        if sh is None:
            return jax.device_put(tree, self.replicated)
        return jax.tree_util.tree_map(jax.device_put, tree, sh)

    def _enforce_state_sharding(self):
        """In a sharded-param mode, pin the train step's output state to
        the same per-leaf shardings as its input.  Sharding propagation
        usually does this on its own, but it is compiler-chosen; an
        explicit ``out_shardings`` makes donation + persistence guaranteed
        rather than incidental."""
        shardings = self._tree_shardings(self.state)
        if shardings is None:
            return
        from functools import partial as _partial

        inner = self._train_step

        @_partial(jax.jit, donate_argnums=0,
                  out_shardings=(shardings, None))
        def outer(state, *args):
            return inner(state, *args)

        self._train_step = outer

    # -- dispatch-amortized multi-step training ---------------------------- #

    def _step_extra_args(self):
        """Per-trainer pytrees the jitted step takes between ``state`` and
        ``batch`` (frozen stage params).  Passed as jit ARGUMENTS -- closing
        over them would bake multi-hundred-MB constants into the program
        (rejected by the remote-compile endpoint, see sampling/context.py)."""
        return ()

    def _make_multi_step(self):
        """K train steps as ONE XLA program: ``lax.scan`` of the per-step
        function over a stacked [K, B, ...] batch.  Removes the per-step
        host-dispatch gap (~10% of train wall time on a slow host, PERF.md);
        the reference dispatches every micro-op from python."""
        from functools import partial as _partial

        inner = self._train_step

        @_partial(jax.jit, donate_argnums=0)
        def multi(state, extras, batches):
            def body(s, b):
                return inner(s, *extras, b)
            return jax.lax.scan(body, state, batches)

        return multi

    # -- device-resident data ---------------------------------------------- #

    def _resident_device_data(self):
        """The step-key corpus as HBM-resident (replicated) device arrays,
        materialized once per trainer.  Replication is deliberate: the
        per-chip gather then needs no collective, and the corpora this
        mode targets are small next to HBM (module docstring,
        training/resident.py)."""
        if getattr(self, "_resident_cache", None) is None:
            from .resident import materialize_step_arrays
            host = materialize_step_arrays(self.train_dataset,
                                           self._step_batch_keys())
            if is_primary():
                mb = sum(a.nbytes for a in host.values()) / 2 ** 20
                print(f"device-resident corpus: "
                      f"{len(self.train_dataset)} items, "
                      f"{mb:.1f} MB/chip (replicated)", flush=True)
            if jax.process_count() > 1:
                from jax import make_array_from_process_local_data
                self._resident_cache = jax.tree_util.tree_map(
                    lambda x: make_array_from_process_local_data(
                        self.replicated, x), host)
            else:
                self._resident_cache = jax.device_put(host, self.replicated)
        return self._resident_cache

    def _make_resident_multi_step(self, k: int):
        """K train steps as one XLA program over the device-resident
        corpus: each scan iteration gathers its minibatch on device --
        from the host-loader-equal index rows ('epoch' mode, scanned as
        xs) or from in-jit uniform draws keyed by (seed, state.step)
        ('uniform' mode).  Either way the stream is a pure function of
        the step counter, so resume is deterministic for any k and any
        checkpoint step."""
        from functools import partial as _partial

        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import mesh_data_axes
        from .resident import DATA_STREAM_TAG, sample_batch

        inner = self._train_step
        b = (self.micro_batch * self.num_iterations * jax.process_count())
        n = len(self.train_dataset)
        aug = bool(getattr(self.train_dataset, "augmentation", False))
        data_key = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                      DATA_STREAM_TAG)
        idx_sharding = NamedSharding(self.mesh,
                                     P(mesh_data_axes(self.mesh)))

        if self.resident_sampling == "epoch":
            @_partial(jax.jit, donate_argnums=0)
            def multi(state, extras, data, idx):
                def body(s, ix):
                    key = jax.random.fold_in(data_key, s.step)
                    batch = sample_batch(data, key, b, n, flip=aug,
                                         indices=ix)
                    return inner(s, *extras, batch)
                return jax.lax.scan(body, state, idx)
        else:
            @_partial(jax.jit, donate_argnums=0)
            def multi(state, extras, data):
                def body(s, _):
                    key = jax.random.fold_in(data_key, s.step)
                    batch = sample_batch(data, key, b, n, flip=aug,
                                         index_sharding=idx_sharding)
                    return inner(s, *extras, batch)
                return jax.lax.scan(body, state, None, length=k)

        return multi

    def _resident_index_chunks(self, start_step: int, k: int,
                               max_steps: Optional[int]):
        """'epoch'-mode index stream: device arrays [c, B_global] of the
        host loader's exact batch indices (training/resident.py::
        epoch_global_indices), chunked on the same schedule as the host
        path so resume realignment is identical.  ~25 KB per dispatch --
        the only bytes the resident loop still ships."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import mesh_data_axes
        from .resident import epoch_global_indices

        sh = NamedSharding(self.mesh, P(None, mesh_data_axes(self.mesh)))
        bpe = self.loader.batches_per_epoch()
        epoch, offset = divmod(start_step, bpe)
        rank, bloc = self.loader.rank, self.loader.batch_size
        multihost = jax.process_count() > 1

        def rows():
            e, off = epoch, offset
            while True:
                table = epoch_global_indices(self.loader, e)
                for i in range(off, len(table)):
                    yield table[i]
                off, e = 0, e + 1

        it = rows()
        for c in self._chunk_schedule(start_step, k, max_steps):
            chunk = np.stack([next(it) for _ in range(c)])
            if multihost:
                local = chunk[:, rank * bloc:(rank + 1) * bloc]
                yield jax.make_array_from_process_local_data(sh, local)
            else:
                yield jax.device_put(chunk, sh)

    @staticmethod
    def _chunk_schedule(start_step: int, k: int, max_steps: Optional[int]):
        """Chunk sizes covering (start_step, max_steps]: realign to
        multiples of k first (resumes from signal-time checkpoints land on
        arbitrary steps), then k at a time, then the tail.  At most 3
        distinct sizes -> at most 3 compiled multi-step programs."""
        s = start_step
        while max_steps is None or s < max_steps:
            c = k - s % k if s % k else k
            if max_steps is not None:
                c = min(c, max_steps - s)
            yield c
            s += c

    def _chunked_batch_iterator(self, start_step: int, k: int,
                                max_steps: Optional[int]) -> Iterator[dict]:
        """Device stream of [chunk, B, ...] stacked batches (chunk dim
        replicated, batch dim sharded).  Consumes the SAME host batch
        sequence as the single-step iterator, so bitwise-deterministic
        resume is preserved for any k."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import mesh_data_axes
        epoch, offset = divmod(start_step, self.loader.batches_per_epoch())
        host_it = self._filter_batch_keys(
            self.loader.infinite(start_epoch=epoch, skip_batches=offset))

        def stacked():
            for c in self._chunk_schedule(start_step, k, max_steps):
                bs = [next(host_it) for _ in range(c)]
                yield {key: np.stack([b[key] for b in bs])
                       for key in bs[0]}

        return prefetch_to_device(
            stacked(), size=2,
            sharding=NamedSharding(self.mesh,
                                   P(None, mesh_data_axes(self.mesh))))

    # -- multi-process eval helpers --------------------------------------- #

    def _eval_shard(self, total: int):
        """This process's ``(count, offset)`` slice of eval-generation work
        (reference ``dispatch_num_samples_for_process`` + rank-ordered
        gather, trainer/base_trainer.py:143-159)."""
        from ..parallel import dispatch_num_samples_for_process, process_index
        local = dispatch_num_samples_for_process(total)
        offset = sum(dispatch_num_samples_for_process(total, rank=r)
                     for r in range(process_index()))
        return local, offset

    def _eval_local(self, tree):
        """Process-local copy of a (globally replicated) param tree for
        eval compute.  In multi-process runs eval work is sharded with
        per-process shapes (and may be skipped entirely on some ranks);
        jit calls on GLOBAL arrays are collectives every process must
        join, so running them per-rank would deadlock.  ``device_get`` is
        safe on fully-replicated arrays and the subsequent jit is purely
        local.  Single-process (the common case): no copy."""
        if jax.process_count() == 1:
            return tree
        # getattr + mode-string parse: callable unbound with minimal
        # stubs in tests that set only param_sharding
        mode = getattr(self, "param_sharding", "replicated")
        if {"fsdp", "tp"} & set(mode.split("+")):
            # leaves have non-addressable shards; all-gather to the host
            # (collective -- every process calls _eval_local in evaluate())
            from ..parallel import host_copy_tree
            return host_copy_tree(tree)
        return jax.device_get(tree)

    def _gather_eval_images(self, local_imgs: np.ndarray):
        """Concatenate per-process eval images on the primary; returns None
        on non-primary processes (reference ``gather_data`` to rank 0,
        trainer/base_trainer.py:156-159 + train_regular_diffusion.py:143-168).
        Collective: every process must call this."""
        from ..parallel import gather_objects
        if jax.process_count() > 1:
            parts = gather_objects([np.asarray(local_imgs)])
        else:
            parts = [np.asarray(local_imgs)]
        if not is_primary():
            return None
        return np.concatenate(parts, axis=0)

    # -- subclass hooks -------------------------------------------------- #

    def _compute_dtype(self):
        """Model compute dtype: bf16 on TPU by default (replaces the
        reference's AMP/GradScaler machinery -- no loss scaling needed),
        fp32 elsewhere; override with runner_config.compute_dtype or the
        reference's optimizer_config.enable_amp."""
        import jax.numpy as jnp
        name = self.runner_config.get("compute_dtype")
        if name is None:
            if self.config.get("optimizer_config", {}).get("enable_amp"):
                return jnp.bfloat16
            return (jnp.bfloat16 if jax.default_backend() == "tpu"
                    else jnp.float32)
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]

    def _build(self):
        raise NotImplementedError

    def train_step(self, state, batch):
        raise NotImplementedError

    def evaluate(self, step: int):
        pass

    def state_dict(self) -> Dict[str, Any]:
        raise NotImplementedError

    def load_state_dict(self, raw) -> None:
        raise NotImplementedError

    # -- checkpointing --------------------------------------------------- #

    def save(self, step: int, snapshot: bool = False):
        """Checkpoint without stalling the device: the device->host copy
        happens here (cheap), serialization + disk write in a background
        thread (writes are atomic tmp+rename, utils/checkpoint.py).  The
        reference blocks training for the whole torch.save
        (train_regular_diffusion.py:180-201)."""
        sd = {"step": np.asarray(step, np.int32), **self.state_dict()}
        latest = os.path.join(self.run_path, "checkpoints", "latest.ckpt")
        paths = [latest] + ([snapshot_path(self.run_path, step)]
                            if snapshot else [])
        if self.checkpoint_format == "sharded":
            return self._save_sharded(sd, paths, step)
        if self._params_sharded and jax.process_count() > 1:
            # sharded leaves are not host-addressable; all-gather first
            # (collective -- save() is called from the loop on every process)
            from ..parallel import host_copy_tree
            sd = host_copy_tree(sd)
        if not is_primary():
            return
        sd = jax.device_get(sd)
        self._join_save()
        file_paths = []
        for p in paths:
            if os.path.isdir(p):
                # this run previously saved the sharded format here;
                # replace the directory WITHOUT a no-checkpoint window:
                # write the new file to a sibling first, only then drop
                # the directory and swap (resume self-heals from the
                # .swap sibling if we crash between those two steps).
                # Refuse to delete anything that is not recognizably a
                # (possibly torn) sharded checkpoint of ours.
                if not _ours_ckpt_dir(p):
                    raise ValueError(
                        f"checkpoint target {p} is a directory but not a "
                        f"sharded checkpoint; refusing to overwrite")
                import shutil
                save_checkpoint(p + ".swap", sd)
                shutil.rmtree(p)
                os.replace(p + ".swap", p)
            else:
                file_paths.append(p)
        if not file_paths:
            return

        def _write():
            for p in file_paths:
                save_checkpoint(p, sd)

        self._spawn_save(_write)

    def _spawn_save(self, fn):
        """Run the checkpoint write in a background thread, capturing any
        exception so the next ``_join_save`` re-raises it -- a save that
        silently never lands must not look like a healthy run."""
        import threading

        def runner():
            try:
                fn()
            except BaseException as e:   # re-raised on join
                self._save_error = e

        self._save_error = None
        self._save_thread = threading.Thread(target=runner, daemon=False)
        self._save_thread.start()

    def _save_sharded(self, sd, paths, step):
        """Per-process sharded save (``checkpoint_format: sharded``):
        every process writes only the slices it owns (replica-id-0
        shards) -- NO all-gather, no full host copy, per-process IO of
        ~1/Nth of the model (utils/sharded_checkpoint.py).  Shard files
        are step-tagged and the manifest (written last) lists this
        save's exact file set, so an in-place re-save of latest.ckpt is
        crash-consistent: at any interruption point the directory's
        manifest references one complete save.  Single process: written
        by the async writer thread, like the full format.
        Multi-process: written synchronously, because the completion
        barrier before the primary's manifest write is a collective and
        collectives must stay on the main thread, ordered with the
        train step's."""
        from ..utils import (extract_local_shards, manifest_skeleton,
                             write_manifest, write_shard_file)
        from ..utils.sharded_checkpoint import cleanup_stale_shards
        tag = str(int(step))
        local = extract_local_shards(sd)   # device pull: 1/Nth of state
        skeleton = manifest_skeleton(sd)
        self._join_save()
        for p in paths:
            try:     # run previously saved the full-file format; every
                # process races on the shared dir -- losing the race is
                # fine: FileNotFoundError (peer unlinked first) or
                # IsADirectoryError (peer already recreated the dir)
                if not os.path.isdir(p):
                    os.unlink(p)
            except OSError:
                pass
            os.makedirs(p, exist_ok=True)
        if jax.process_count() > 1:
            for p in paths:
                write_shard_file(p, local, tag)
            from ..parallel import sync_global_devices
            sync_global_devices("sharded_ckpt")
            if is_primary():
                for p in paths:
                    write_manifest(p, skeleton, tag)
                    cleanup_stale_shards(p)
            return

        def _write():
            for p in paths:
                write_shard_file(p, local, tag)
                write_manifest(p, skeleton, tag)
                cleanup_stale_shards(p)

        self._spawn_save(_write)

    def _join_save(self):
        t = getattr(self, "_save_thread", None)
        if t is not None:
            t.join()
            self._save_thread = None
            err = getattr(self, "_save_error", None)
            if err is not None:
                self._save_error = None
                if jax.process_count() > 1:
                    # raising here on one rank would strand the others in
                    # their next collective; request the CONSENSUS stop
                    # (same mechanism as preemption) and surface the error
                    # after every process has left the loop together
                    self._save_error_deferred = err
                    self._stop_local = True
                    if is_primary():
                        print(f"checkpoint write failed ({err!r}); "
                              f"stopping by consensus", flush=True)
                else:
                    raise RuntimeError(
                        "background checkpoint write failed") from err

    # -- loop ------------------------------------------------------------ #

    def train(self, max_steps: Optional[int] = None,
              save_on_exit: bool = True):
        rc = self.runner_config
        display = int(rc.get("display_steps", 100))
        eval_every = int(rc.get("evaluate_every_steps", 5000))
        save_latest = int(rc.get("save_latest_every_steps", 1000))
        save_snap = int(rc.get("save_checkpoint_every_steps", 10000))

        # steps_per_dispatch > 1: scan K steps inside one XLA program
        # (boundary cadences must align with chunk ends)
        k = int(rc.get("steps_per_dispatch", 1))
        resident = self.device_resident
        if k > 1:
            for name, val in (("display_steps", display),
                              ("evaluate_every_steps", eval_every),
                              ("save_latest_every_steps", save_latest),
                              ("save_checkpoint_every_steps", save_snap)):
                if val % k:
                    raise ValueError(
                        f"runner_config.{name}={val} must be a multiple of "
                        f"steps_per_dispatch={k}")
            if not resident:
                # memoized on self: a fresh closure per train() call would
                # be a new jit cache entry, so every repeated/segmented
                # call would re-trace and re-lower the K-step program
                if getattr(self, "_multi_step_fn", None) is None:
                    self._multi_step_fn = self._make_multi_step()
                multi_step = self._multi_step_fn
        if k > 1 or resident:
            extras = self._step_extra_args()
        # the loop continues from the LIVE optimizer step, not the
        # resume-time snapshot: a second in-process train() call picks up
        # where the first stopped (same data fast-forward as a checkpoint
        # resume) instead of silently replaying its steps and batches.
        # One host sync per train() call.
        loop_start = int(self.state.step)
        if resident:
            # corpus on device once; the loop dispatches index-sampling
            # K-step programs and never touches host data again
            rdata = self._resident_device_data()
            if getattr(self, "_resident_fns", None) is None:
                self._resident_fns: Dict[int, Any] = {}  # memoized, see above
            rfns = self._resident_fns
            repoch = self.resident_sampling == "epoch"
            rsrc = (self._resident_index_chunks(loop_start, k, max_steps)
                    if repoch
                    else self._chunk_schedule(loop_start, k, max_steps))

        meters = Meters()
        losses = collections.defaultdict(list)
        it = (None if resident
              else self._chunked_batch_iterator(loop_start, k, max_steps)
              if k > 1 else self._batch_iterator(loop_start))
        step = loop_start
        last_saved = step
        if self.profile_dir and is_primary():
            jax.profiler.start_trace(self.profile_dir)

        # preemption safety: checkpoint before dying on SIGTERM/SIGINT
        # (the reference's only recovery is manual --resume; SURVEY.md §5).
        # Multi-process runs stop by CONSENSUS at a boundary step (a signal
        # may reach only some hosts; save/eval contain collectives in fsdp
        # mode, so all processes must exit the loop at the same step).  The
        # consensus cadence is min(display, save_latest) so the preemption
        # grace window never depends on a large display_steps alone.
        multiproc = jax.process_count() > 1
        consensus_every = min(display, save_latest)
        stop = {"local": False, "flag": False}

        def _graceful(signum, frame):
            stop["local"] = True
            if not multiproc:
                stop["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _graceful)
            except ValueError:
                pass
        t_end = time.perf_counter()
        window_steps = 0       # true step count per display window (the
        first_window = True    # first window of a run/resume holds compile)
        try:
            while (max_steps is None or step < max_steps) and not stop["flag"]:
                t0 = time.perf_counter()
                # step calls run under the mesh context: model-side
                # sharding hints (parallel.constrain_batch at the encoder
                # flatten) see the ambient mesh at trace time.  Scoped to
                # the step only -- eval/save do host-local jits that must
                # NOT trace under the global mesh in multi-process runs.
                if resident:
                    if repoch:
                        ix = next(rsrc)
                        c = int(ix.shape[0])
                    else:
                        c, ix = next(rsrc), None
                    fn = rfns.get(c)
                    if fn is None:
                        fn = rfns[c] = self._make_resident_multi_step(c)
                    t1 = time.perf_counter()
                    step += c
                    window_steps += c
                    rargs = (extras, rdata) + ((ix,) if repoch else ())
                    with self.mesh:
                        self.state, metrics = fn(self.state, *rargs)
                elif k > 1:
                    batch = next(it)
                    t1 = time.perf_counter()
                    # leading (chunk) dim is static array metadata, no sync
                    c = jax.tree_util.tree_leaves(batch)[0].shape[0]
                    step += c
                    window_steps += c
                    with self.mesh:
                        self.state, metrics = multi_step(self.state, extras,
                                                         batch)
                else:
                    batch = next(it)
                    t1 = time.perf_counter()
                    step += 1
                    window_steps += 1
                    with self.mesh:
                        self.state, metrics = self.train_step(self.state,
                                                              batch)
                # keep DEVICE scalars/arrays (no host sync) every step;
                # block once per display window when converting to floats
                for name, v in metrics.items():
                    losses[name].append(v)
                meters.add("load_data", t1 - t0)
                if step % display == 0:
                    avg = {name: float(np.mean(np.concatenate(
                               [np.atleast_1d(np.asarray(x, np.float64))
                                for x in v])))
                           for name, v in losses.items()}
                    t2 = time.perf_counter()
                    window = t2 - t_end
                    # rate from the ACTUAL steps in this window (a resume
                    # from a signal-time checkpoint realigns mid-window);
                    # 0.0 for the first window, which holds the compile
                    rate = 0.0 if first_window else window_steps / window
                    self.logger.scalars(step, {
                        **avg, "steps_per_sec": rate,
                        "time/step": window / max(window_steps, 1),
                        "time/load_data": meters.summary().get(
                            "load_data", 0.0)})
                    if is_primary():
                        print(f"step {step}: " + " ".join(
                            f"{k}={v:.5f}" for k, v in avg.items())
                            + f" ({rate:.2f} it/s)", flush=True)
                    losses.clear()
                    meters.reset()
                    first_window = False
                    window_steps = 0
                    t_end = time.perf_counter()
                if multiproc and step % consensus_every == 0:
                    from ..parallel import gather_objects
                    stop["flag"] = any(gather_objects(
                        [stop["local"]
                         or getattr(self, "_stop_local", False)]))
                if step % save_latest == 0 or step % save_snap == 0:
                    # one save covers both cadences (a snapshot step would
                    # otherwise pay the state_dict gather + write twice)
                    self.save(step, snapshot=step % save_snap == 0)
                    last_saved = step
                if step % eval_every == 0:
                    self.evaluate(step)
            # final save (normal exit only -- short and preempted runs
            # always leave a checkpoint; on an exception the last GOOD
            # checkpoint must not be overwritten mid-flight).
            # save_on_exit=False lets step-loop benchmarks segment a run
            # into timed train() calls without paying a full state gather
            # + serialize per segment (scripts/bench_latent_loop.py).
            if step != last_saved and save_on_exit:
                self.save(step)
        finally:
            # an exception mid-loop must not leak the replaced signal
            # handlers, an open profiler trace, or an unjoined save thread
            if self.profile_dir and is_primary():
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass
            for sig, handler in old_handlers.items():
                signal.signal(sig, handler)
            self._join_save()   # never return/raise with a write in flight
        err = getattr(self, "_save_error_deferred", None)
        if err is not None:
            self._save_error_deferred = None
            raise RuntimeError("background checkpoint write failed "
                               "(run stopped by consensus)") from err
        return step
