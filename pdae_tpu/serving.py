"""Batched inference service over a trained PDAE stack.

The reference exposes inference only as one-shot torchrun scripts
(``/root/reference/sampler/*.py``); production serving needs resident
models and compile-once execution.  ``PDAEService`` loads the stage
artifacts once (through the same ``SamplerContext``/checkpoint machinery
as the sampler suite), pads request batches to power-of-two buckets so
each op compiles one XLA program per bucket (cached thereafter), and
shards batches over every local chip (``parallel.pad_shard_batch``) --
one process saturates a whole host.

Ops (gated by the artifacts present in the config):
  * ``encode(images)``                -> z             [needs PDAE ckpt]
  * ``autoencode(images)``            -> reconstructions
  * ``generate(n, seed)``             -> samples       [+ latent ckpt + stats]
  * ``manipulate(images, attribute, scale)`` -> edits  [+ classifier ckpt]

``scripts/serve.py`` wraps this in a stdlib JSON-over-HTTP server.
"""

from __future__ import annotations

import math
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .parallel import local_mesh, pad_shard_batch, replicate
from .sampling.context import SamplerContext
from .utils import to_uint8


def _bucket(n: int, max_batch: int) -> int:
    """Next power-of-two >= n, capped at max_batch."""
    return min(1 << max(0, (n - 1)).bit_length(), max_batch)


class PDAEService:
    """Resident PDAE inference service (see module docstring).

    ``config`` uses the same keys as the sampler YAMLs: ``config_path`` +
    ``checkpoint_path`` (PDAE stage), optional ``latent_config_path`` +
    ``latent_checkpoint_path`` + ``inferred_latents_path`` (generation),
    optional ``classifier_checkpoint_path`` (manipulation), plus
    ``image_size`` / ``image_channel`` / ``max_batch``; ``tp_size: K``
    turns on tensor parallelism over the local chips (channel-sharded
    params -- a batch of 1 uses all K devices, see parallel/mesh.py);
    ``sp_size: K`` turns on spatial parallelism instead (params
    replicated, activations H-sharded via the models' constrain_spatial
    hints -- a batch of 1 splits its rows across all K devices, the
    lowest-latency layout for the conv-dominated trunk).

    Determinism: on TPU the decoders' upsample convs can switch to the
    fused lhs-dilated form by static batch (ops.use_fused_upsample,
    PERF.md "128px train breakdown"), whose bf16 tap sums reassociate --
    under the raw auto gate the SAME request could differ at the
    ~1e-2-relative level depending on the coalesced batch size it landed
    in.  The service therefore PINS the mode at construction
    (``config["fused_upsample"]: "on" | "off" | "auto"``, default auto =
    pick once by ``max_batch``): one service instance has one numerics
    for every bucket, coalescing included.  The pin is process-global
    (the gate is consulted at trace time), which is the normal serving
    deployment; ``self.fused_upsample`` records what was pinned.
    """

    def __init__(self, config: dict):
        self.config = config
        self.ctx = SamplerContext(config)
        self.ctx.build_pdae()
        self.size = int(config.get(
            "image_size",
            self.ctx._pdae_cfg["train_dataset_config"]["image_size"]))
        self.channels = int(config.get("image_channel", 3))
        self.max_batch = int(config.get("max_batch", 64))
        # pin the fused-upsample numerics for this service (see class
        # docstring): auto resolves ONCE from max_batch instead of
        # per-trace from whatever batch the coalescer formed
        from . import ops
        fu = str(config.get("fused_upsample", "auto")).lower()
        if fu in ("on", "true", "1"):
            self.fused_upsample = True
        elif fu in ("off", "false", "0"):
            self.fused_upsample = False
        elif fu == "auto":
            self.fused_upsample = ops.use_fused_upsample(self.max_batch)
        else:
            raise ValueError(f"fused_upsample must be on|off|auto, "
                             f"got {fu!r}")
        ops.set_fused_upsample(self.fused_upsample)
        # tp_size > 1: tensor parallelism over local chips -- params
        # channel-shard over the 'model' axis, so a SINGLE image uses
        # every chip (lowest latency); batches shard over the remaining
        # 'data' axis.  Default (1): plain data-parallel local mesh.
        self.tp_size = int(config.get("tp_size", 1))
        # sp_size > 1: spatial parallelism -- params replicated,
        # activations H-sharded (the models' constrain_spatial hints see
        # the mesh because every op traces under `with self._mesh`); a
        # SINGLE image splits its rows across every chip.
        self.sp_size = int(config.get("sp_size", 1))
        if self.tp_size > 1 and self.sp_size > 1:
            raise ValueError("tp_size and sp_size are mutually exclusive")
        if self.tp_size > 1:
            from .parallel import make_tp_mesh
            self._mesh = make_tp_mesh(self.tp_size,
                                      devices=jax.local_devices())
            self._tp_min = int(config.get("tp_min_size", 2 ** 15))
            self.ctx.enc_params = self._place_params(self.ctx.enc_params)
            self.ctx.dec_params = self._place_params(self.ctx.dec_params)
        elif self.sp_size > 1:
            from .parallel import make_sp_mesh
            self._mesh = make_sp_mesh(self.sp_size,
                                      devices=jax.local_devices())
            self.ctx.enc_params = self._place_params(self.ctx.enc_params)
            self.ctx.dec_params = self._place_params(self.ctx.dec_params)
        else:
            self._mesh = local_mesh()
        self._stats = None
        self._clf_weight = None
        # lazy artifact loading (latent stats, classifier, generate fn) can
        # be reached from a batcher worker thread and a direct caller at
        # once; loads are idempotent but this keeps them single-shot
        self._init_lock = threading.Lock()
        ctx = self.ctx

        # params-first jitted programs; jax.jit caches one executable per
        # (op, bucket-size) pair
        gd = ctx.gd
        self._autoencode_fn = jax.jit(
            lambda ep, dp, x, es, ds: gd.representation_learning_autoencoding(
                es, ds, lambda xx: ctx.enc_apply(ep, xx),
                lambda xx, tt, zz: ctx.dec_apply(dp, xx, tt, zz), x),
            static_argnums=(3, 4))
        self._encode_fn = jax.jit(ctx.enc_apply)
        self._decode_fn = jax.jit(
            lambda dp, z, x_T, ds: gd.representation_learning_ddim_sample(
                ds, None, lambda xx, tt, zz: ctx.dec_apply(dp, xx, tt, zz),
                None, x_T, z),
            static_argnums=(3,))
        self._encode_xt_fn = jax.jit(
            lambda ep, dp, x, es: gd.representation_learning_ddim_encode(
                es, lambda xx: ctx.enc_apply(ep, xx),
                lambda xx, tt, zz: ctx.dec_apply(dp, xx, tt, zz), x),
            static_argnums=(3,))
        self._generate_fn = None
        self._manip_fn = None

    # -- helpers --------------------------------------------------------- #

    def _place_params(self, tree):
        """Channel-shard a param tree over the tp mesh, or replicate it
        over the sp mesh (activations shard there, params don't); no-op
        layout change otherwise -- params stay as SamplerContext placed
        them."""
        if self.tp_size > 1:
            from .parallel import shard_tree_tp
            return shard_tree_tp(self._mesh, tree, min_size=self._tp_min)
        if self.sp_size > 1:
            from .parallel import replicate
            return replicate(self._mesh, tree)
        return tree

    def _to_model_input(self, images: np.ndarray) -> jnp.ndarray:
        """uint8 [N,H,W,C] (or float in [-1,1]) -> float32 [-1,1]."""
        arr = np.asarray(images)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0 * 2.0 - 1.0
        return jnp.asarray(arr, jnp.float32)

    def _pad_bucket_shard(self, x: jnp.ndarray):
        """Pad the batch to its bucket, then shard over local chips."""
        n = int(x.shape[0])
        if n == 0:
            raise ValueError("empty batch")
        if n > self.max_batch:
            raise ValueError(f"batch {n} exceeds max_batch {self.max_batch}")
        b = _bucket(n, self.max_batch)
        if b > n:
            x = jnp.concatenate([x, jnp.repeat(x[:1], b - n, axis=0)], axis=0)
        sharded, _ = pad_shard_batch(self._mesh, x)
        return sharded, n

    # -- ops ------------------------------------------------------------- #

    def encode(self, images) -> np.ndarray:
        """images -> semantic latents z [N, latent_dim]."""
        x, n = self._pad_bucket_shard(self._to_model_input(images))
        # ops trace under the mesh context so model-side sharding hints
        # (parallel.constrain_batch at the encoder flatten) see the tp
        # mesh -- without it the flatten boundary costs an involuntary
        # full rematerialization in tp mode
        with self._mesh:
            return np.asarray(self._encode_fn(self.ctx.enc_params, x))[:n]

    def autoencode(self, images, encode_style: Optional[str] = None,
                   decode_style: Optional[str] = None) -> np.ndarray:
        """images -> reconstructions (uint8), the SSIM-0.994 path."""
        es = encode_style or self.config.get("encoder_ddim_style", "ddim100")
        ds = decode_style or self.config.get("decoder_ddim_style", "ddim100")
        x, n = self._pad_bucket_shard(self._to_model_input(images))
        with self._mesh:
            out = self._autoencode_fn(self.ctx.enc_params,
                                      self.ctx.dec_params, x, es, ds)
        return to_uint8(np.asarray(out)[:n])

    def generate(self, n: int, seed: int = 0,
                 latent_style: Optional[str] = None,
                 decode_style: Optional[str] = None) -> np.ndarray:
        """Unconditional samples via the latent DPM (uint8 [n,H,W,C])."""
        ctx = self.ctx
        with self._init_lock:
            if self._generate_fn is None:
                ctx.build_latent()
                ctx.lat_params = self._place_params(ctx.lat_params)
                self._stats = ctx.latent_stats()
                gd = ctx.gd

                def fn(lp, dp, z_T, x_T, ls, ds):
                    return gd.latent_diffusion_sample(
                        None, ls, ds,
                        lambda zt, tt: ctx.latent_apply(lp, zt, tt),
                        lambda xx, tt, zz: ctx.dec_apply(dp, xx, tt, zz),
                        x_T, self._stats[0], self._stats[1],
                        latent_dim=ctx.latent_input_channel, z_T=z_T)

                self._generate_fn = jax.jit(fn, static_argnums=(4, 5))
        ls = latent_style or self.config.get("latent_ddim_style", "ddim100")
        ds = decode_style or self.config.get("decoder_ddim_style", "ddim100")
        key = jax.random.PRNGKey(seed)
        zk, xk = jax.random.split(key)
        b = _bucket(n, self.max_batch)
        if n > self.max_batch:
            raise ValueError(f"n {n} exceeds max_batch {self.max_batch}")
        z_T = jax.random.normal(zk, (b, ctx.latent_input_channel))
        x_T = jax.random.normal(
            xk, (b, self.size, self.size, self.channels))
        x_T, _ = pad_shard_batch(self._mesh, x_T)
        z_T, _ = pad_shard_batch(self._mesh, z_T)
        with self._mesh:
            out = self._generate_fn(ctx.lat_params, ctx.dec_params, z_T, x_T,
                                    ls, ds)
        return to_uint8(np.asarray(out)[:n])

    def manipulate(self, images, attribute=None, class_id: int = 31,
                   scale: float = 0.3, encode_style: Optional[str] = None,
                   decode_style: Optional[str] = None) -> np.ndarray:
        """Semantic attribute edit (reference manipulation sampler)."""
        ctx = self.ctx
        with self._init_lock:
            if self._clf_weight is None:
                self._stats = self._stats or ctx.latent_stats()
                self._clf_weight = ctx.classifier_weight()
        if attribute is not None:
            from .data.datasets import CELEBAHQ
            if attribute not in CELEBAHQ.LABEL_TO_ID:
                raise ValueError(
                    f"unknown attribute {attribute!r}; one of "
                    f"{sorted(CELEBAHQ.LABEL_TO_ID)}")
            class_id = CELEBAHQ.LABEL_TO_ID[attribute]
        es = encode_style or self.config.get("encode_ddim_style", "ddim500")
        ds = decode_style or self.config.get("decode_ddim_style", "ddim200")
        with self._init_lock:
            if self._manip_fn is None:
                gd = ctx.gd

                def fn(ep, dp, w, x, xt, s, cid, dstyle):
                    return gd.manipulation_sample(
                        dstyle, w, lambda xx: ctx.enc_apply(ep, xx),
                        lambda xx, tt, zz: ctx.dec_apply(dp, xx, tt, zz),
                        x, xt, self._stats[0], self._stats[1], cid, s)

                self._manip_fn = jax.jit(fn, static_argnums=(6, 7))
        x, n = self._pad_bucket_shard(self._to_model_input(images))
        with self._mesh:
            x_T = self._encode_xt_fn(ctx.enc_params, ctx.dec_params, x, es)
            out = self._manip_fn(ctx.enc_params, ctx.dec_params,
                                 self._clf_weight, x, x_T,
                                 jnp.float32(scale), int(class_id), ds)
        return to_uint8(np.asarray(out)[:n])


class CoalescingBatcher:
    """Merge concurrent per-image requests into single device batches.

    Production serving pattern with no reference counterpart: N clients
    each posting a few images would otherwise dispatch N small XLA
    executions; the batcher drains all requests waiting at the end of a
    short window, groups them by (op, kwargs), concatenates the images,
    runs ONE bucketed call per group, and splits the results back.  Works
    for the image-list ops (``encode`` / ``autoencode`` / ``manipulate``);
    ``generate`` takes no batchable input so callers use the service
    directly.

    ``submit()`` blocks until the caller's slice is ready and re-raises
    any op error in the calling thread.  ``stats()['calls']`` counts
    underlying service invocations (tests assert coalescing happened).
    """

    OPS = ("encode", "autoencode", "manipulate")

    def __init__(self, service: PDAEService, window_ms: float = 3.0):
        self.service = service
        self.window_s = window_ms / 1000.0
        self._cv = threading.Condition()
        self._pending = []
        self._stop = False
        self._calls = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, op: str, images, **kwargs):
        if op not in self.OPS:
            raise ValueError(f"op must be one of {self.OPS}, got {op!r}")
        images = np.asarray(images)
        slot = {"event": threading.Event()}
        # the group key includes per-image shape and dtype: requests with
        # different geometries or uint8-vs-float inputs must NOT share a
        # concatenated batch (concat would fail, or dtype promotion would
        # silently skip _to_model_input's uint8 rescale)
        sig = (op, tuple(sorted(kwargs.items())),
               images.shape[1:], images.dtype.str)
        try:
            hash(sig)   # unhashable kwarg value: fail HERE, in the caller,
        except TypeError as e:   # never in the shared worker thread
            raise TypeError(f"non-hashable kwargs for coalescing: {e}")
        with self._cv:
            if self._stop:
                raise RuntimeError("batcher closed")
            self._pending.append((sig, images, kwargs, slot))
            self._cv.notify()
        # bounded waits with a liveness check: if the worker thread is gone
        # (e.g. a BaseException delivered into it), don't block forever
        while not slot["event"].wait(timeout=1.0):
            if not self._worker.is_alive():
                raise RuntimeError("batcher worker died; request dropped")
        if "err" in slot:
            raise slot["err"]
        return slot["out"]

    def stats(self):
        with self._cv:
            return {"calls": self._calls}

    def close(self):
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._worker.join()

    def _run(self):
        while True:
            with self._cv:
                while not self._pending and not self._stop:
                    self._cv.wait()
                if self._stop and not self._pending:
                    return
            # short accumulation window: let concurrent posts pile up
            time.sleep(self.window_s)
            with self._cv:
                batch, self._pending = self._pending, []
            try:
                groups = {}
                for sig, images, kwargs, slot in batch:
                    groups.setdefault(sig, []).append((images, kwargs, slot))
                for sig, entries in groups.items():
                    op = sig[0]
                    # chunk so one group never exceeds the service bucket cap
                    cap = self.service.max_batch
                    i = 0
                    while i < len(entries):
                        chunk, n = [], 0
                        while i < len(entries) and (
                                not chunk
                                or n + len(entries[i][0]) <= cap):
                            chunk.append(entries[i])
                            n += len(entries[i][0])
                            i += 1
                        self._run_chunk(op, chunk)
            except BaseException as e:
                # catch-all: the worker must never exit with waiters blocked
                # -- deliver the failure to every slot of this drained batch
                # that hasn't resolved yet.  BaseException (KeyboardInterrupt
                # / SystemExit delivered into this thread) still fails the
                # slots first, then propagates and ends the worker; blocked
                # submit() calls notice via the liveness check.
                err = e if isinstance(e, Exception) else RuntimeError(
                    f"batcher worker interrupted: {e!r}")
                for _, _, _, slot in batch:
                    if not slot["event"].is_set():
                        slot["err"] = err
                        slot["event"].set()
                if not isinstance(e, Exception):
                    raise

    def _run_chunk(self, op, chunk):
        imgs = np.concatenate([e[0] for e in chunk], axis=0)
        kwargs = chunk[0][1]
        try:
            out = getattr(self.service, op)(imgs, **kwargs)
            with self._cv:
                self._calls += 1
            off = 0
            for images, _, slot in chunk:
                slot["out"] = out[off:off + len(images)]
                off += len(images)
                slot["event"].set()
        except Exception as e:   # deliver the failure to every waiter
            for _, _, slot in chunk:
                slot["err"] = e
                slot["event"].set()
