"""Training / evaluation engine.

Loss and loop contracts from `/root/reference/multiview_detector/trainer.py`:

- ``loss = world_focal + world_off_l1
         + (img_focal + img_off_l1 + 0.1 * img_wh_l1) / N * alpha``
  (`trainer.py:52-63`), or the MVDet MSE alternative (`trainer.py:64-66`),
- test loop: dense decode of the sigmoided BEV heatmap + offsets, threshold at
  ``cls_thres``, greedy 0.5 m NMS, CLEAR evaluation (`trainer.py:99-169`).

TPU design: one jitted train step (donated state), one jitted eval step that
also performs fixed-shape top-K candidate extraction + NMS on device; only the
final [K, 3] candidate arrays cross to host.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvdetr_tpu import losses
from mvdetr_tpu.evaluation import clear_metrics
from mvdetr_tpu.ops import distance_nms, mvdet_decode


def supervised_loss(outputs, batch, alpha: float = 1.0, use_mse: bool = False):
    """Compose the MVDeTr loss (`trainer.py:52-66`). Returns (loss, aux)."""
    (world_heatmap, world_offset), (imgs_heatmap, imgs_offset, imgs_wh) = outputs
    wgt, igt = batch["world_gt"], batch["imgs_gt"]
    b, n = igt["heatmap"].shape[:2]

    def flat(x):  # [B, N, ...] -> [B*N, ...]
        return x.reshape((b * n,) + x.shape[2:])

    if use_mse:
        loss = jnp.mean((world_heatmap - wgt["heatmap"]) ** 2) + alpha * jnp.mean(
            (imgs_heatmap - flat(igt["heatmap"])) ** 2
        )
        return loss, {"loss": loss}

    loss_w_hm = losses.focal_loss(world_heatmap, wgt["heatmap"])
    loss_w_off = losses.reg_l1_loss(world_offset, wgt["reg_mask"], wgt["idx"], wgt["offset"])
    loss_img_hm = losses.focal_loss(imgs_heatmap, flat(igt["heatmap"]))
    loss_img_off = losses.reg_l1_loss(imgs_offset, flat(igt["reg_mask"]), flat(igt["idx"]), flat(igt["offset"]))
    loss_img_wh = losses.reg_l1_loss(imgs_wh, flat(igt["reg_mask"]), flat(igt["idx"]), flat(igt["wh"]))

    w_loss = loss_w_hm + loss_w_off
    img_loss = loss_img_hm + loss_img_off + 0.1 * loss_img_wh
    loss = w_loss + img_loss / n * alpha
    return loss, {
        "loss": loss,
        "w_hm": loss_w_hm,
        "w_off": loss_w_off,
        "img_hm": loss_img_hm,
        "img_off": loss_img_off,
        "img_wh": loss_img_wh,
    }


@functools.partial(jax.jit, static_argnames=("alpha", "use_mse"), donate_argnames=("state",))
def train_step(state, batch, rng, alpha: float = 1.0, use_mse: bool = False):
    def loss_fn(params):
        outputs, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["imgs"],
            batch["affine_mats"],
            train=True,
            mutable=["batch_stats", "diagnostics"],
            rngs={"dropout": rng},
        )
        loss, aux = supervised_loss(outputs, batch, alpha, use_mse)
        diag = mutated.get("diagnostics", {})
        if diag:  # e.g. per-layer offset_clip_fraction (windowed-clamp health)
            aux["offset_clip_fraction"] = jnp.mean(jnp.stack(jax.tree.leaves(diag)))
        return loss, (aux, mutated["batch_stats"])

    (loss, (aux, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_stats)
    return state, aux


@functools.partial(
    jax.jit,
    static_argnames=("world_reduce", "num_candidates", "alpha", "use_mse", "nms_dist"),
)
def eval_step(
    state,
    batch,
    world_reduce: int = 4,
    num_candidates: int = 512,
    alpha: float = 1.0,
    use_mse: bool = False,
    nms_dist: float = 20.0,
):
    """Forward + dense decode + on-device top-K NMS.

    Returns (loss_aux, xys [B, K, 3], keep [B, K]) where xys rows are
    (x, y, score) in full-resolution xy grid units, NMS-filtered with the
    0.5 m radius (`trainer.py:121-135`).
    """
    outputs, mutated = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["imgs"],
        batch["affine_mats"],
        train=False,
        mutable=["diagnostics"],
    )
    loss, aux = supervised_loss(outputs, batch, alpha, use_mse)
    diag = mutated.get("diagnostics", {})
    if diag:
        # windowed-clamp health at EVAL time — the signal that tells a
        # converted-checkpoint eval (--load_torch_ckpt with a fast attention
        # mode) whether the radius clamp is actually binding on the loaded
        # offsets (interop.py guidance)
        aux["offset_clip_fraction"] = jnp.mean(jnp.stack(jax.tree.leaves(diag)))
    (world_heatmap, world_offset), _ = outputs

    score = jax.nn.sigmoid(world_heatmap)
    xys = mvdet_decode(score, world_offset, reduce=world_reduce)  # [B, HW, 3]
    k = min(num_candidates, xys.shape[1])
    top_scores, top_idx = jax.lax.top_k(xys[:, :, 2], k)
    top_xy = jnp.take_along_axis(xys[:, :, :2], top_idx[..., None], axis=1)

    keep = jax.vmap(lambda pts, sc: distance_nms(pts, sc, nms_dist))(top_xy, top_scores)
    return aux, jnp.concatenate([top_xy, top_scores[..., None]], axis=-1), keep


class Trainer:
    """Epoch-level driver (host side): data iteration, logging, CLEAR eval."""

    def __init__(
        self,
        state,
        dataset_train,
        dataset_test,
        cls_thres: float = 0.4,
        alpha: float = 1.0,
        use_mse: bool = False,
        nms_top_k: int = 512,
        logger=print,
        mesh=None,
        num_workers: int = 0,
        prefetch: int = 2,
        profile_dir: Optional[str] = None,
    ):
        self.state = state
        self.train_set = dataset_train
        self.test_set = dataset_test
        self.cls_thres = cls_thres
        self.alpha = alpha
        self.use_mse = use_mse
        self.nms_top_k = nms_top_k
        self.log = logger
        self.mesh = mesh
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.profile_dir = profile_dir
        self._rng = jax.random.PRNGKey(0)
        self._sharded_train = None
        self._sharded_eval = None
        self._batch_shardings = None
        if mesh is not None:
            from mvdetr_tpu.parallel import batch_shardings, make_sharded_train_step, replicate_state

            self._sharded_train = make_sharded_train_step(mesh, alpha=alpha, use_mse=use_mse)
            self._batch_shardings = batch_shardings(mesh)
            self.state = replicate_state(self.state, mesh)

    def _step(self, batch, rng):
        return self._step_on(self.state, batch, rng)

    def _batches(self, batch_size: int):
        """Worker-assembled host train batches, staged on device ahead of the
        step (double-buffered; `main.py:70-73` DataLoader analogue). On
        multi-host runs each host assembles only its data-axis slice and the
        slices are stitched into globally sharded arrays."""
        from mvdetr_tpu.data.prefetch import prefetch_to_device

        put = None
        local_slice = None
        if self.mesh is not None and jax.process_count() > 1:
            from mvdetr_tpu.parallel import global_batch_from_local, process_batch_slice

            local_slice = process_batch_slice(batch_size, self.mesh)
            put = lambda b: global_batch_from_local(
                b, self.mesh, frame_offset=local_slice.start, global_batch=batch_size
            )
        it = self.train_set.batches(batch_size, num_workers=self.num_workers, local_slice=local_slice)
        return prefetch_to_device(it, size=self.prefetch, shardings=self._batch_shardings, put=put)

    def check_determinism(self, batch_size: int = 1) -> None:
        """Debug aid (reference `--deterministic`, `main.py:43-46` analogue):
        run the first train step twice from identical state/batch/rng and
        assert bitwise-identical parameters. XLA is deterministic by design;
        this guards against nondeterministic custom kernels sneaking in."""
        batch = next(iter(self._batches(batch_size)))
        rng = jax.random.PRNGKey(1234)
        state_a = jax.tree.map(jnp.copy, self.state)
        state_b = jax.tree.map(jnp.copy, self.state)
        out_a, _ = self._step_on(state_a, batch, rng)
        out_b, _ = self._step_on(state_b, batch, rng)
        mismatch = jax.tree.map(lambda x, y: not bool((x == y).all()), out_a.params, out_b.params)
        bad = [jax.tree_util.keystr(p) for p, v in jax.tree_util.tree_leaves_with_path(mismatch) if v]
        assert not bad, f"nondeterministic train step; first mismatching params: {bad[:5]}"
        self.log("determinism check passed: train step is bitwise reproducible")

    def _step_on(self, state, batch, rng):
        if self._sharded_train is not None:
            return self._sharded_train(state, batch, rng)
        return train_step(state, batch, rng, self.alpha, self.use_mse)

    def train_epoch(self, epoch: int, batch_size: int = 1, log_interval: int = 100) -> float:
        t0 = time.time()
        losses_dev, count = [], 0  # device scalars; fetched only at log points
        # jax.profiler device trace of steady-state steps 2-4 of epoch 1
        # (step 1 is the compile; SURVEY §5 tracing — the reference only has
        # wall-clock accumulators, `trainer.py:40-43,68-82`)
        profiling = False
        for batch in self._batches(batch_size):
            self._rng, step_rng = jax.random.split(self._rng)
            if self.profile_dir is not None and epoch == 1 and count == 1 and not profiling:
                float(losses_dev[-1])  # compile barrier — trace only steady-state work
                jax.profiler.start_trace(self.profile_dir)
                profiling = True
            self.state, aux = self._step(batch, step_rng)
            losses_dev.append(aux["loss"])
            count += 1
            if profiling and count >= 4:
                float(aux["loss"])  # completion barrier so the trace holds full steps
                jax.profiler.stop_trace()
                profiling = False
                self.log(f"profiler trace written to {self.profile_dir}")
            if count % log_interval == 0:
                total = float(jnp.sum(jnp.stack(losses_dev)))
                clip = (f", clip_frac {float(aux['offset_clip_fraction']):.4f}"
                        if "offset_clip_fraction" in aux else "")
                self.log(f"Train epoch {epoch} batch {count}: loss {total / count:.6f}{clip}, "
                         f"t {time.time() - t0:.1f}s")
        if profiling:  # epoch shorter than the trace window
            jax.profiler.stop_trace()
            self.log(f"profiler trace written to {self.profile_dir}")
        elif self.profile_dir is not None and epoch == 1 and count < 2:
            self.log(f"NOTE: --profile requested but epoch 1 had only {count} batch(es) — "
                     "no trace was written (the window starts at batch 2)")
        total = float(jnp.sum(jnp.stack(losses_dev))) if losses_dev else 0.0
        self.log(f"Train epoch {epoch} done: loss {total / max(count, 1):.6f}, t {time.time() - t0:.1f}s")
        if count and "offset_clip_fraction" in aux:
            clip_frac = float(aux["offset_clip_fraction"])
            if clip_frac > 0.05:
                self.log(
                    f"WARNING: offset_clip_fraction {clip_frac:.3f} > 0.05 — the windowed "
                    f"attention clamp is starving learned offsets (accuracy risk, see "
                    f"BENCH_NOTES clamp table). Raise --n_points to 8 (shadow refs, same "
                    f"fast path), or widen --attn_radius."
                )
        return total / max(count, 1)

    def test(self, batch_size: int = 1, res_fpath: Optional[str] = None,
             visualize_dir: Optional[str] = None):
        t0 = time.time()
        total, count = 0.0, 0
        rows = []
        cap_hits = 0
        last_batch = None
        indexing_ij = self.train_set.rig.indexing == "ij"
        if self.mesh is not None and self._sharded_eval is None:
            from mvdetr_tpu.parallel import make_sharded_eval_step

            self._sharded_eval = make_sharded_eval_step(
                self.mesh, world_reduce=self.test_set.world_reduce,
                num_candidates=self.nms_top_k, alpha=self.alpha, use_mse=self.use_mse,
            )
        data_size = int(self.mesh.shape.get("data", 1)) if self.mesh is not None else 1
        multiproc = self.mesh is not None and jax.process_count() > 1
        from mvdetr_tpu.data.prefetch import prefetch_to_device

        def emit(xys, keep, frames):
            """Detection rows from the (host-visible) eval outputs. All hosts
            see identical replicated outputs, so rows agree across processes."""
            nonlocal cap_hits
            xys = np.asarray(xys)
            keep = np.asarray(keep)
            for b in range(xys.shape[0]):
                above = xys[b, :, 2] > self.cls_thres
                # the eval step keeps only the top `nms_top_k` cells; if every
                # one clears the threshold the cap likely truncated candidates
                # (the reference thresholds all cells, `trainer.py:131-135`)
                cap_hits += int(above.all())
                sel = keep[b] & above
                pos = xys[b, sel, :2]
                if indexing_ij:  # grid (x, y) -> dataset-native (`trainer.py:125-128`)
                    pos = pos[:, [1, 0]]
                for p in pos:
                    rows.append([int(frames[b]), p[0], p[1]])

        if multiproc:
            # Each host assembles only its data-axis slice of every full
            # global batch (`parallel/multihost.py`); eval outputs come back
            # fully replicated, so every host emits the same rows. Frame ids
            # come from the deterministic (shuffle=False) dataset order — the
            # sharded `batch["frame"]` array is not host-readable.
            from mvdetr_tpu.parallel import global_batch_from_local, process_batch_slice

            frames_order = [int(f) for f in self.test_set.frames]
            n_full = len(frames_order) // batch_size
            local_slice = process_batch_slice(batch_size, self.mesh)
            it = self.test_set.batches(
                batch_size, shuffle=False, drop_last=True,
                num_workers=self.num_workers, local_slice=local_slice,
            )
            put = lambda b: global_batch_from_local(
                b, self.mesh, frame_offset=local_slice.start, global_batch=batch_size
            )
            for bi, batch in enumerate(prefetch_to_device(it, size=self.prefetch, put=put)):
                aux, xys, keep = self._sharded_eval(self.state, batch)
                total += float(aux["loss"])
                count += 1
                emit(xys, keep, frames_order[bi * batch_size : (bi + 1) * batch_size])
            # ragged tail: pad with repeats of the last frame up to a full
            # batch and run the SAME sharded eval step (no duplicated
            # per-host work, no second jit variant); padded rows are dropped
            # at emit. Loss: aux['loss'] is the mean over the PADDED batch
            # (duplicate rows included), so weighting by the tail fraction
            # only approximates the true tail loss — test_loss is slightly
            # biased toward the repeated last frame. Detections/MODA are
            # exact (padded rows never emit).
            tail_idx = list(range(n_full * batch_size, len(frames_order)))
            if tail_idx:
                from mvdetr_tpu.data.dataset import collate

                padded = tail_idx + [tail_idx[-1]] * (batch_size - len(tail_idx))
                local_idx = padded[local_slice]
                batch = put(collate([self.test_set[i] for i in local_idx]))
                aux, xys, keep = self._sharded_eval(self.state, batch)
                frac = len(tail_idx) / batch_size
                total += float(aux["loss"]) * frac
                count += frac
                emit(xys[: len(tail_idx)], keep[: len(tail_idx)],
                     [frames_order[i] for i in tail_idx])
        else:
            host_batches = self.test_set.batches(
                batch_size, shuffle=False, drop_last=False, num_workers=self.num_workers
            )
            for batch in prefetch_to_device(host_batches, size=self.prefetch):
                if self._sharded_eval is not None and batch["imgs"].shape[0] % data_size == 0:
                    from mvdetr_tpu.parallel import shard_batch

                    aux, xys, keep = self._sharded_eval(self.state, shard_batch(batch, self.mesh))
                else:  # unsharded fallback (ragged final batch, or no mesh)
                    aux, xys, keep = eval_step(
                        self.state,
                        batch,
                        world_reduce=self.test_set.world_reduce,
                        num_candidates=self.nms_top_k,
                        alpha=self.alpha,
                        use_mse=self.use_mse,
                    )
                total += float(aux["loss"])
                count += 1
                last_batch = batch
                emit(xys, keep, np.asarray(batch["frame"]))

        if cap_hits:
            self.log(
                f"WARNING: eval top-K cap ({self.nms_top_k}) saturated on {cap_hits} frame(s) — "
                "detections may be truncated; raise --nms_top_k"
            )
        if count and "offset_clip_fraction" in aux:
            clip_frac = float(aux["offset_clip_fraction"])
            self.log(f"Eval offset_clip_fraction {clip_frac:.4f}")
            if clip_frac > 0.05:
                self.log(
                    "WARNING: >5% of attention offsets are clamped by the windowed radius "
                    "at eval — results may diverge from reference-exact semantics; use "
                    "--attn_mode gather or raise --attn_radius (see interop.py)."
                )
        det = np.asarray(rows, dtype=np.float64).reshape(-1, 3)
        if res_fpath is not None and jax.process_index() == 0:
            np.savetxt(res_fpath, det, "%d")
        if visualize_dir is not None and last_batch is not None and not multiproc:
            self._dump_heatmaps(last_batch, visualize_dir)
        gt = self.test_set.gt_array()
        # CLEAR matches on the integer-truncated rows as written to test.txt
        # via np.savetxt('%d') (`trainer.py:158-159`)
        recall, precision, moda, modp = clear_metrics(gt, np.floor(det) if len(det) else det)
        self.log(
            f"Test: loss {total / max(count, 1):.6f}, moda {moda:.1f}%, modp {modp:.1f}%, "
            f"prec {precision:.1f}%, recall {recall:.1f}%, t {time.time() - t0:.1f}s"
        )
        return total / max(count, 1), moda, modp, precision, recall

    def _dump_heatmaps(self, batch, out_dir: str):
        """Predicted vs target BEV heatmap images (`trainer.py:141-155` parity)."""
        import os

        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        os.makedirs(out_dir, exist_ok=True)
        outputs = self.state.apply_fn(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            batch["imgs"], batch["affine_mats"], train=False,
        )
        (world_heatmap, _), (imgs_heatmap, _, _) = outputs
        fig, (ax0, ax1) = plt.subplots(2, 1, figsize=(10, 6))
        ax0.set_title("output")
        ax0.imshow(jax.nn.sigmoid(world_heatmap)[0, :, :, 0])
        ax1.set_title("target")
        ax1.imshow(batch["world_gt"]["heatmap"][0, :, :, 0])
        fig.savefig(os.path.join(out_dir, "world.jpg"))
        plt.close(fig)
        fig, ax = plt.subplots()
        ax.imshow(jax.nn.sigmoid(imgs_heatmap)[0, :, :, 0])
        ax.set_title("cam1 foot heatmap")
        fig.savefig(os.path.join(out_dir, "cam1_foot.jpg"))
        plt.close(fig)
        from mvdetr_tpu.utils.visualize import save_forward_stage_figures

        save_forward_stage_figures(self.state, batch, out_dir)  # `mvdetr.py:163-217` parity
        self._dump_shadow_figure(batch, out_dir, plt)

    def _dump_shadow_figure(self, batch, out_dir: str, plt) -> None:
        """Per-camera attended-point scatter for the strongest BEV query —
        the paper's shadow figure (`deform_visualize.py:44-139` parity)."""
        import os

        from mvdetr_tpu.utils.visualize import capture_attention, shadow_backprojected

        try:
            outputs, layers = capture_attention(self.state, batch)
        except Exception:
            return  # model without deformable attention (conv fusion etc.)
        if not layers:
            return
        (world_heatmap, _), _ = outputs
        rig = self.train_set.rig
        hm = jax.nn.sigmoid(world_heatmap)[0, :, :, 0]
        hs2, ws2 = (v // 2 for v in self.train_set.Rworld_shape)
        # strongest BEV cell, snapped to the (stride-2) query grid
        y, x = jnp.unravel_index(jnp.argmax(hm), hm.shape)
        qy, qx = min(int(y) // 2, hs2 - 1), min(int(x) // 2, ws2 - 1)
        q = qy * ws2 + qx  # first camera copy's query block
        locs = layers[-1]["sampling_locations"][0]
        wgts = layers[-1]["attention_weights"][0]
        bev, _ = shadow_backprojected(rig, locs, wgts, q,
                                      world_reduce=self.train_set.world_reduce, downsample=2)
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.imshow(np.asarray(hm), cmap="gray")
        colors = plt.cm.tab10(np.linspace(0, 1, len(bev)))
        for cam, (pts, wts) in bev.items():
            sel = wts > wts.max() * 0.1 if len(wts) else slice(None)
            ax.scatter(pts[sel, 0] * 2, pts[sel, 1] * 2, s=40 * wts[sel] / (wts.max() + 1e-8),
                       color=colors[cam], label=f"cam{cam + 1}", alpha=0.7)
        ax.scatter([qx * 2], [qy * 2], marker="x", color="red", s=80)
        ax.legend(fontsize=6)
        ax.set_title("shadow attention (last layer, strongest query)")
        fig.savefig(os.path.join(out_dir, "shadow_points.jpg"))
        plt.close(fig)
