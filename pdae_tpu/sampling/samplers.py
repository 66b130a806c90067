"""The sampler/eval suite: 9 entry points matching the reference's
``sampler/*.py`` behaviors, each driving jitted lax.scan sampling programs.

Every sampler is a class with ``__init__(config: dict)`` + ``start()``;
``scripts/sample.py`` dispatches by name.  Reference parity notes are in
each docstring (file:line cites).

Param trees are always passed as jit ARGUMENTS (see context.py docstring).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import ddim as ddim_lib
from ..metrics import MSEMetric, SSIMMetric
from ..parallel import (dispatch_num_samples_for_process, is_primary,
                        process_shard_indices)
from ..utils import save_checkpoint, save_image_grid, to_uint8
from ..utils.image import make_grid, paste_rows
from .context import SamplerContext


class BaseSampler:
    def __init__(self, config: dict):
        self.config = config
        self.ctx = SamplerContext(config)
        self.seed = int(config.get("seed", 0))
        self._mesh = None

    def key(self, salt: int = 0):
        return jax.random.fold_in(jax.random.PRNGKey(self.seed), salt)

    def shard(self, x):
        """Shard a batch over this process's chips (GSPMD), wrap-padding to
        a device multiple.  Returns ``(sharded, original_n)``; slice
        outputs with ``[:original_n]``.  This makes the big sampling loops
        multi-chip WITHIN a process -- the reference only scales sampling
        across processes (one GPU each, sampler/base_sampler.py)."""
        from ..parallel import local_mesh, pad_shard_batch
        if self._mesh is None:
            self._mesh = local_mesh()
        return pad_shard_batch(self._mesh, x)

    def start(self):
        raise NotImplementedError

    # jit helpers: encoder/decoder callables reconstructed from arg params
    def _enc(self, ep):
        return lambda xx: self.ctx.enc_apply(ep, xx)

    def _dec(self, dp):
        return lambda xx, tt, zz: self.ctx.dec_apply(dp, xx, tt, zz)


class TestDPMs(BaseSampler):
    """Sanity-check a pre-trained DPM: DDIM-100 from noise, 9-image grid
    (reference sampler/test_dpms.py:31-42)."""

    def start(self):
        ch = int(self.config["image_channel"])
        size = int(self.config["image_size"])
        n = int(self.config.get("num_samples", 9))
        ctx = self.ctx
        ctx.build_denoise()
        style = self.config.get("ddim_style", "ddim100")
        fn = jax.jit(lambda p, x_T: ctx.gd.test_pretrained_dpms(
            style, lambda xx, tt, cc=None: ctx.denoise_apply(p, xx, tt, cc),
            x_T))
        x_T, real = self.shard(jax.random.normal(self.key(),
                                                 (n, size, size, ch)))
        samples = to_uint8(np.asarray(fn(ctx.dn_params, x_T))[:real])
        out = ctx.output_path("test_dpms_result.png")
        save_image_grid(samples, out, nrow=int(math.ceil(math.sqrt(n))))
        return out


class AutoencodingExample(BaseSampler):
    """Single image: deterministic full autoencode (ddim1000 encode ->
    ddim100 decode), plus 5 DDIM and 5 stochastic DDPM reconstructions from
    random x_T; merged row PNG (reference sampler/autoencoding_example.py)."""

    def start(self):
        ctx = self.ctx
        ctx.build_pdae()
        ds = ctx.dataset()
        data = ds[int(self.config["image_index"])]
        gt = data["gt"]
        x_0 = jnp.asarray(data["x_0"])[None]
        gd = ctx.gd

        enc_style = self.config.get("encoder_ddim_style", "ddim1000")
        dec_style = self.config.get("decoder_ddim_style", "ddim100")

        recon = jax.jit(
            lambda ep, dp, x: gd.representation_learning_autoencoding(
                enc_style, dec_style, self._enc(ep), self._dec(dp), x))(
            ctx.enc_params, ctx.dec_params, x_0)

        x_0_rep = jnp.tile(x_0, (5, 1, 1, 1))
        k1, k2 = jax.random.split(self.key())
        ddpm = jax.jit(
            lambda ep, dp, k, x, xT: gd.representation_learning_ddpm_sample(
                k, self._enc(ep), self._dec(dp), x, xT))(
            ctx.enc_params, ctx.dec_params, k1, x_0_rep,
            jax.random.normal(k2, x_0_rep.shape))
        ddim = jax.jit(
            lambda ep, dp, x, xT: gd.representation_learning_ddim_sample(
                dec_style, self._enc(ep), self._dec(dp), x, xT))(
            ctx.enc_params, ctx.dec_params, x_0_rep,
            jax.random.normal(self.key(7), x_0_rep.shape))

        row = np.concatenate([gt[None], to_uint8(np.asarray(recon)),
                              to_uint8(np.asarray(ddim)),
                              to_uint8(np.asarray(ddpm))])
        out = ctx.output_path("autoencoding_example_result.png")
        save_image_grid(row, out, nrow=row.shape[0])
        return out


class AutoencodingEval(BaseSampler):
    """Dataset-wide reconstruction metrics: per-batch autoencode
    (ddim1000 encode + ddim100 decode) then SSIM/LPIPS/MSE on
    [0,1]-normalized pairs (reference sampler/autoencoding_eval.py:72-100).
    This is the benchmark behind the README's SSIM 0.994 / MSE 3.84e-5."""

    def start(self):
        ctx = self.ctx
        ctx.build_pdae()
        ds = ctx.dataset()
        gd = ctx.gd
        enc_style = self.config.get("encoder_ddim_style", "ddim1000")
        dec_style = self.config.get("decoder_ddim_style", "ddim100")
        batch_size = int(self.config.get("batch_size", 16))
        max_samples = self.config.get("max_samples")  # None = whole dataset

        fn = jax.jit(
            lambda ep, dp, x: gd.representation_learning_autoencoding(
                enc_style, dec_style, self._enc(ep), self._dec(dp), x))

        ssim_m, mse_m = SSIMMetric(), MSEMetric()
        lpips_m = None
        lpips_path = self.config.get("lpips_weights")
        if lpips_path:
            from ..metrics import LPIPSMetric
            lpips_m = LPIPSMetric(lpips_path)

        n = len(ds) if max_samples is None else min(int(max_samples), len(ds))
        collate = type(ds).collate_fn
        # shard the evaluation across processes (reference uses a
        # DistributedSampler, autoencoding_eval.py:26-43)
        my_idx = process_shard_indices(n)
        for start in range(0, len(my_idx), batch_size):
            idxs = list(my_idx[start:start + batch_size])
            real = len(idxs)
            # pad the last chunk so the DDIM program compiles exactly once
            while len(idxs) < batch_size:
                idxs.append(idxs[-1])
            batch = collate([ds[int(i)] for i in idxs])
            x_0, _ = self.shard(jnp.asarray(batch["x_0"]))
            recon = np.asarray(fn(ctx.enc_params, ctx.dec_params, x_0))[:real]
            # reference compares on [0,1] (autoencoding_eval.py:84-88)
            a = (recon + 1.0) / 2.0
            b = (np.asarray(batch["x_0"])[:real] + 1.0) / 2.0
            ssim_m.process(a, b)
            mse_m.process(a, b)
            if lpips_m is not None:
                lpips_m.process(a, b)

        # `is not None`, not truthiness: BaseMetric defines __len__, so a
        # zero-result metric would be silently dropped from the gather
        for m in [m for m in (ssim_m, mse_m, lpips_m) if m is not None]:
            m.all_gather_results()
        results = {"ssim": ssim_m.compute_metrics(),
                   "mse": mse_m.compute_metrics()}
        if lpips_m is not None:
            results["lpips"] = lpips_m.compute_metrics()
        if is_primary():
            print({k: f"{v:.6g}" for k, v in results.items()})
        return results


class InferLatents(BaseSampler):
    """Encode the whole dataset, save z mean/std stats
    (reference sampler/infer_latents.py:43-55)."""

    def start(self):
        ctx = self.ctx
        ctx.build_pdae()
        ds = ctx.dataset()
        encoder = jax.jit(ctx.enc_apply)
        batch_size = int(self.config.get("batch_size", 100))
        max_samples = self.config.get("max_samples")
        n = len(ds) if max_samples is None else min(int(max_samples), len(ds))
        collate = type(ds).collate_fn
        my_idx = process_shard_indices(n, pad_to_even=False)
        zs = []
        for start in range(0, len(my_idx), batch_size):
            idxs = list(my_idx[start:start + batch_size])
            real = len(idxs)
            while len(idxs) < batch_size:
                idxs.append(idxs[-1])
            batch = collate([ds[int(i)] for i in idxs])
            x_0, _ = self.shard(jnp.asarray(batch["x_0"]))
            zs.append(np.asarray(encoder(ctx.enc_params, x_0))[:real])
        from ..parallel import gather_objects
        zs = gather_objects(zs)
        latent = np.concatenate(zs, axis=0)
        name = self.config["dataset_config"].get(
            "name", self.config["dataset_config"].get("dataset_name"))
        out = self.config.get(
            "output_path", f"./{str(name).lower()}.ckpt")
        save_checkpoint(out, {"mean": latent.mean(0),
                              "std": latent.std(0, ddof=1)})
        return out


class GapMeasure(BaseSampler):
    """Posterior-mean-gap curves with vs without shift over all t for a
    sample of images; matplotlib curve PNG (reference sampler/gap_measure.py).
    Keeps the reference's uniform-noise quirk (gaussian_diffusion.py:302)."""

    def start(self):
        ctx = self.ctx
        ctx.build_pdae()
        ds = ctx.dataset()
        gd = ctx.gd
        batch_size = int(self.config.get("batch_size", 16))
        total = int(self.config.get("num_samples", 1000))
        collate = type(ds).collate_fn
        fn = jax.jit(
            lambda ep, dp, k, x: gd.representation_learning_gap_measure(
                k, self._enc(ep), self._dec(dp), x))
        gaps, ae_gaps = [], []
        total_eff = min(total, len(ds))
        n_full = max((total_eff // batch_size) * batch_size, batch_size)
        if n_full != total_eff:
            print(f"gap_measure: using {n_full} samples "
                  f"(full batches of {batch_size}; {total_eff} requested)")
        for start in range(0, n_full, batch_size):
            batch = collate([ds[i % len(ds)] for i in
                             range(start, start + batch_size)])
            x_0 = jnp.asarray(batch["x_0"])
            # the gap fn reduces over the batch INSIDE the program, so only
            # shard when no wrap-padding would bias the mean
            if x_0.shape[0] % jax.local_device_count() == 0:
                x_0, _ = self.shard(x_0)
            g, ag = fn(ctx.enc_params, ctx.dec_params, self.key(start), x_0)
            gaps.append(np.asarray(g))
            ae_gaps.append(np.asarray(ag))
        gap = np.mean(np.stack(gaps), axis=0)
        ae_gap = np.mean(np.stack(ae_gaps), axis=0)

        out = ctx.output_path("gap_measure_result.png")
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            ts = np.arange(gd.timesteps - 1, -1, -1)
            plt.figure(figsize=(8, 5))
            plt.plot(ts, gap, label="pre-trained DPM")
            plt.plot(ts, ae_gap, label="PDAE (with shift)")
            plt.xlabel("timestep")
            plt.ylabel("posterior mean gap (MSE)")
            plt.legend()
            plt.savefig(out, dpi=120)
            plt.close()
        except Exception:
            np.savez(out + ".npz", gap=gap, ae_gap=ae_gap)
        return gap, ae_gap


class DenoiseOneStep(BaseSampler):
    """Single image at several t: one-step predicted x_0 with vs without
    shift; merged PNG (reference sampler/denoise_one_step.py:38-68)."""

    def start(self):
        ctx = self.ctx
        ctx.build_pdae()
        ds = ctx.dataset()
        data = ds[int(self.config["image_index"])]
        timestep_list = list(self.config.get("timestep_list",
                                             [400, 500, 600, 700, 800]))
        x_0 = jnp.tile(jnp.asarray(data["x_0"])[None],
                       (len(timestep_list), 1, 1, 1))
        fn = jax.jit(lambda ep, dp, k, x: ctx.gd
                     .representation_learning_denoise_one_step(
                         k, self._enc(ep), self._dec(dp), x, timestep_list))
        pred_x0, ae_pred_x0 = fn(ctx.enc_params, ctx.dec_params,
                                 self.key(), x_0)
        rows = [np.concatenate([data["gt"][None],
                                to_uint8(np.asarray(pred_x0))]),
                np.concatenate([data["gt"][None],
                                to_uint8(np.asarray(ae_pred_x0))])]
        out = ctx.output_path("denoise_one_step_result.png")
        paste_rows(rows, out)
        return out


class Interpolation(BaseSampler):
    """Two images: row 1 = slerp(x_T)+lerp(z) decode; row 2 = per-step
    gradient-blend trajectory interpolation
    (reference sampler/interpolation.py:49-104)."""

    @staticmethod
    def slerp(a, b, alpha):
        af, bf = a.reshape(-1), b.reshape(-1)
        theta = jnp.arccos(jnp.dot(af, bf)
                           / (jnp.linalg.norm(af) * jnp.linalg.norm(bf)))
        sin_theta = jnp.sin(theta)
        return (a * jnp.sin((1.0 - alpha) * theta) / sin_theta
                + b * jnp.sin(alpha * theta) / sin_theta)

    @staticmethod
    def lerp(a, b, alpha):
        return (1.0 - alpha) * a + alpha * b

    def start(self):
        ctx = self.ctx
        ctx.build_pdae()
        ds = ctx.dataset()
        d1 = ds[int(self.config["image_index_1"])]
        d2 = ds[int(self.config["image_index_2"])]
        x_0 = jnp.stack([jnp.asarray(d1["x_0"]), jnp.asarray(d2["x_0"])])
        gd = ctx.gd
        style = self.config.get("ddim_style", "ddim100")

        z = ctx.enc_apply(ctx.enc_params, x_0)
        x_T = jax.jit(
            lambda ep, dp, x, zz: gd.representation_learning_ddim_encode(
                style, self._enc(ep), self._dec(dp), x, zz))(
            ctx.enc_params, ctx.dec_params, x_0, z)
        z_1, z_2 = z[0:1], z[1:2]
        x_T_1, x_T_2 = x_T[0:1], x_T[1:2]

        decode = jax.jit(
            lambda dp, xt, zz: gd.representation_learning_ddim_sample(
                style, None, self._dec(dp), None, xt, zz))
        traj = jax.jit(
            lambda dp, za, zb, xt, a: gd
            .representation_learning_ddim_trajectory_interpolation(
                style, self._dec(dp), za, zb, xt, a))

        alphas = list(self.config.get(
            "alphas", [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]))
        row1, row2 = [d1["gt"]], [d1["gt"]]
        for a in alphas:
            xt = self.slerp(x_T_1, x_T_2, a)
            img1 = decode(ctx.dec_params, xt, self.lerp(z_1, z_2, a))
            img2 = traj(ctx.dec_params, z_1, z_2, xt, a)
            row1.append(to_uint8(np.asarray(img1))[0])
            row2.append(to_uint8(np.asarray(img2))[0])
        row1.append(d2["gt"])
        row2.append(d2["gt"])
        out = ctx.output_path("interpolation_result.png")
        paste_rows([np.stack(row1), np.stack(row2)], out)
        return out


class Manipulation(BaseSampler):
    """One image: infer x_T (ddim500), move z along the normalized
    classifier row, decode (ddim200) for each scale; merged row PNG
    (reference sampler/manipulation.py:43-102)."""

    def start(self):
        from ..data.datasets import CELEBAHQ
        ctx = self.ctx
        ctx.build_pdae()
        ds = ctx.dataset()
        data = ds[int(self.config["image_index"])]
        x_0 = jnp.asarray(data["x_0"])[None]
        gd = ctx.gd
        mean, std = ctx.latent_stats()
        weight = ctx.classifier_weight()
        # precedence: explicit attribute name > explicit class_id >
        # the reference's default (Smiling=31, sampler/manipulation.py)
        if "attribute" in self.config:
            attribute = self.config["attribute"]
            if attribute not in CELEBAHQ.LABEL_TO_ID:
                raise ValueError(f"unknown attribute {attribute!r}; one of "
                                 f"{sorted(CELEBAHQ.LABEL_TO_ID)}")
            class_id = CELEBAHQ.LABEL_TO_ID[attribute]
        else:
            class_id = int(self.config.get("class_id", 31))
        scale_list = list(self.config.get("scale_list",
                                          [-0.3, -0.1, 0.1, 0.3]))
        enc_style = self.config.get("encode_ddim_style", "ddim500")
        dec_style = self.config.get("decode_ddim_style", "ddim200")

        x_T = jax.jit(
            lambda ep, dp, x: gd.representation_learning_ddim_encode(
                enc_style, self._enc(ep), self._dec(dp), x))(
            ctx.enc_params, ctx.dec_params, x_0)

        manip = jax.jit(
            lambda ep, dp, w, x, xt, s: gd.manipulation_sample(
                dec_style, w, self._enc(ep), self._dec(dp), x, xt, mean,
                std, class_id, s))
        results = [to_uint8(np.asarray(manip(
            ctx.enc_params, ctx.dec_params, weight, x_0, x_T, s)))[0]
            for s in scale_list]
        half = len(scale_list) // 2
        row = results[:half] + [data["gt"]] + results[half:]
        out = ctx.output_path("manipulation_result.png")
        save_image_grid(np.stack(row), out, nrow=len(row))
        return out


class UnconditionalSample(BaseSampler):
    """z_T ~ N(0,1) clamped -> latent DDIM -> denormalize -> shift-DDIM
    decode with stop_percent=0.3; grid PNG; optional FID
    (reference sampler/unconditional_sample.py:53-75; FID wiring is the
    metric the reference left unwired -- SURVEY.md #25)."""

    def start(self):
        ctx = self.ctx
        ctx.build_pdae()
        ctx.build_latent()
        ds_cfg = self.config.get("dataset_config", {})
        ch = int(self.config.get("image_channel",
                                 ds_cfg.get("image_channel", 3)))
        size = int(self.config.get("image_size", ds_cfg.get("image_size")))
        total = int(self.config.get("num_samples", 16))
        n = dispatch_num_samples_for_process(total)
        batch = int(self.config.get("batch_size", min(n, 64)))

        mean, std = ctx.latent_stats()
        gd = ctx.gd
        lat_style = self.config.get("latent_ddim_style", "ddim100")
        dec_style = self.config.get("decoder_ddim_style", "ddim100")

        fn = jax.jit(lambda lp, dp, k, x_T: gd.latent_diffusion_sample(
            k, lat_style, dec_style,
            lambda zt, tt: ctx.latent_apply(lp, zt, tt),
            self._dec(dp), x_T, mean, std,
            latent_dim=ctx.latent_input_channel))

        imgs = []
        done = 0
        while done < n:
            b = min(batch, n - done)
            k1, k2 = jax.random.split(jax.random.fold_in(
                self.key(done), jax.process_index()))
            # constant batch shape (pad + slice) so the big DDIM program
            # compiles exactly once; sharded over this process's chips
            x_T, _ = self.shard(jax.random.normal(k2, (batch, size, size, ch)))
            out_imgs = np.asarray(fn(ctx.lat_params, ctx.dec_params, k1, x_T))
            imgs.append(to_uint8(out_imgs[:b]))
            done += b
        local_images = (np.concatenate(imgs) if imgs
                        else np.zeros((0, size, size, ch), np.uint8))
        # gather every process's images; only the primary writes the grid
        # (reference gathers to rank 0, unconditional_sample.py:69-75)
        from ..parallel import gather_objects
        all_imgs = gather_objects(imgs)
        images = (np.concatenate(all_imgs) if all_imgs
                  else np.zeros((0, size, size, ch), np.uint8))

        out = ctx.output_path("unconditional_sample_result.png")
        if is_primary() and len(images):
            save_image_grid(images, out)

        fid_cfg = self.config.get("fid")
        if fid_cfg:
            from ..metrics import FIDMetric, inception_feature_fn
            from ..metrics.fid import activation_statistics
            feature_fn = inception_feature_fn(fid_cfg.get("inception_path"))
            m = (FIDMetric.from_stats_file(feature_fn, fid_cfg["stats_path"])
                 if fid_cfg.get("stats_path") else FIDMetric(feature_fn))
            if m.target_mu is None:
                # reference features are the heavy half of FID: shard the
                # InceptionV3 forwards across processes like the generated
                # side, gather FEATURES, stats on the primary only
                ds = ctx.dataset()
                collate = type(ds).collate_fn
                ref_n = min(int(fid_cfg.get("num_reference", 1000)), len(ds))
                from ..metrics.fid import chunked_features
                my_ref = process_shard_indices(ref_n, pad_to_even=False)
                ref_local = (chunked_features(feature_fn, collate(
                    [ds[int(i)] for i in my_ref])["gts"])
                    if len(my_ref) else None)
                parts = [f for f in gather_objects([ref_local])
                         if f is not None and len(f)]
                if is_primary():
                    m.target_mu, m.target_sigma = activation_statistics(
                        np.concatenate(parts, axis=0))
            # features from the LOCAL shard only; the gather happens on
            # features (computing them on the gathered set would duplicate
            # work and bias np.cov's normalization world-fold)
            if len(local_images):
                m.process(local_images)
            m.all_gather_results()
            # the 2048x2048 sqrtm runs once, on the primary (reference
            # prints metrics on rank 0 only, autoencoding_eval.py:95-99)
            fid = m.compute_metrics() if is_primary() else None
            if is_primary():
                print({"fid": fid})
            return out, fid
        return out


SAMPLERS = {
    "test_dpms": TestDPMs,
    "autoencoding_example": AutoencodingExample,
    "autoencoding_eval": AutoencodingEval,
    "infer_latents": InferLatents,
    "gap_measure": GapMeasure,
    "denoise_one_step": DenoiseOneStep,
    "interpolation": Interpolation,
    "manipulation": Manipulation,
    "unconditional_sample": UnconditionalSample,
}
