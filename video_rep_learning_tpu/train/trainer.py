"""The jit-compiled training loop.

Parity targets (`train.py:57-228`): per-epoch loop with on-device two-view
augmentation fused into the step, loss via the algo registry, grad clipping,
per-epoch LR schedule, NaN-zeroed loss logging, per-epoch val pass, periodic
checkpoint + downstream evaluation, and the reference's timing-marker
telemetry (marker 0 = data wait, 1 = H2D, 2 = fused step; `train.py:75-79,
98-107,119-135,157-178`).

TPU-first: ONE jit-compiled function per training step — augmentation,
backbone, loss, backward, optimizer — so XLA fuses host-side nothing; the
global batch is sharded over the 'data' mesh axis (pjit semantics) which
makes gradient averaging, loss means, SyncBN statistics, and SCL cross-batch
negatives automatic XLA collectives (no NCCL mirror, SURVEY.md §5).
bf16 compute under USE_AMP (no GradScaler needed — fp32 master params and
fp32 loss math keep it stable, documented divergence from `train.py:109-133`).
"""

from __future__ import annotations

import queue as _queue
import threading
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..algos import get_algo
from ..config import ConfigNode
from ..data import construct_dataloader
from ..logging_utils import get_logger
from ..models import build_model
from ..ops.augment import (AugmentParams, eval_augment,
                           make_ssl_batch_augment, supervised_augment)
from ..parallel.mesh import create_mesh, is_root_proc, replicate, shard_batch
from .checkpoint import (load_checkpoint, load_pretrained_params,
                         save_checkpoint, save_mid_checkpoint)
from .optimizer import (learning_rate_for_epoch, make_optimizer, merge_params,
                        split_params)

logger = get_logger(__name__)


def _nan_to_zero(tree):
    return jax.tree_util.tree_map(
        lambda v: jnp.where(jnp.isnan(v), 0.0, v), tree)


class Trainer:
    """Owns model/algo/optimizer/loaders and the compiled step functions."""

    def __init__(self, cfg: ConfigNode, summary_writer=None, no_eval: bool = False,
                 build_loaders: bool = True, mesh=None):
        self.cfg = cfg
        tp = int(cfg.get_path("PARALLEL.TENSOR_PARALLELISM", 1) or 1)
        if mesh is not None:
            self.mesh = mesh
        elif tp > 1:
            import jax as _jax

            from ..parallel.sharding import create_mesh_2d, set_tensor_context

            ndev = len(_jax.devices())
            self.mesh = create_mesh_2d(ndev // tp, tp)
            mode = ("ulysses"
                    if cfg.get_path("PARALLEL.SEQUENCE_PARALLELISM", False)
                    else "heads")
            set_tensor_context(self.mesh, "model", mode)
        else:
            self.mesh = create_mesh()
        # Publish the mesh for per-shard Pallas kernel dispatch (no-op on a
        # single device or under TP/SP, where the kernels are gated off).
        from ..parallel.sharding import set_data_context

        set_data_context(self.mesh)
        self.model = build_model(cfg)
        self.algo = get_algo(cfg)
        self.tx = make_optimizer(cfg)
        self.summary_writer = summary_writer
        self.no_eval = no_eval

        if build_loaders:
            self.train_loader, self.train_emb_loader = construct_dataloader(
                cfg, "train", no_eval=no_eval)
            if not no_eval:
                self.val_loader, self.val_emb_loader = construct_dataloader(cfg, "val")
            else:
                self.val_loader = self.val_emb_loader = None
        else:
            self.train_loader = self.train_emb_loader = None
            self.val_loader = self.val_emb_loader = None

        aug = AugmentParams(image_size=cfg.IMAGE_SIZE,
                            strength=cfg.AUGMENTATION.STRENGTH,
                            mxu_resample=bool(cfg.USE_AMP),
                            bf16_output=bool(cfg.USE_AMP),
                            # in-kernel bf16 photometric math: VPU runs bf16
                            # elementwise at 2.6x the fp32 rate
                            # (tools/bench_vpu_bf16.py); on-chip e2e A/B
                            # (tools/ab_env.py, 3 alternating reps): CARL
                            # +2.3% (19.66 vs 19.22 clips/s) — see
                            # BASELINE.md augment row. VRL_AUG_BF16_MATH=0
                            # restores fp32 math under AMP.
                            bf16_math=bool(cfg.USE_AMP))
        self._ssl_augment = make_ssl_batch_augment(aug)
        self.state: Optional[Dict] = None
        self.start_epoch = 0
        self.start_iter = 0  # > 0 after a mid-epoch (preemption) resume
        self._train_step = None
        self._val_step = None
        self._base_key = jax.random.key(cfg.RNG_SEED)

    # -- state ------------------------------------------------------------

    def _dummy_batch_videos(self):
        cfg = self.cfg
        T = cfg.TRAIN.NUM_FRAMES * cfg.DATA.NUM_CONTEXTS
        if "tcn" in cfg.TRAINING_ALGO:
            pass  # samplers already fold tcn doubling into num_frames
        BV = cfg.TRAIN.BATCH_SIZE * (2 if cfg.SSL else 1)
        S = cfg.IMAGE_SIZE
        return jnp.zeros((BV, T, S, S, 3), jnp.float32)

    def init_state(self, resume_mid: bool = True):
        cfg = self.cfg
        x = self._dummy_batch_videos()
        T = x.shape[1]
        masks = jnp.ones((x.shape[0], 1, T), jnp.float32)
        wants_classifier = cfg.TRAINING_ALGO == "classification"
        project = bool(cfg.MODEL.PROJECTION)

        def init_all(mdl, x, masks):
            out = mdl(x, cfg.TRAIN.NUM_FRAMES, video_masks=masks, project=project)
            if wants_classifier:
                out = mdl(x, cfg.TRAIN.NUM_FRAMES, video_masks=masks,
                          classification=True)
            return out

        rngs = {"params": jax.random.key(cfg.RNG_SEED),
                "dropout": jax.random.key(cfg.RNG_SEED + 1)}
        variables = jax.jit(partial(self.model.init, method=init_all))(rngs, x, masks)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        trainable, frozen = split_params(params, cfg)

        if cfg.MODEL.PRETRAINED_CHECKPOINT and str(
                cfg.MODEL.PRETRAINED_CHECKPOINT).endswith(".pth"):
            # the reference points PRETRAINED_CHECKPOINT at torch .pth files
            # (`configs_mvf/k400_penn_mvf.yml:63`, `models/__init__.py:50-59`)
            # — import it in place so reference configs work verbatim; the
            # optimizer starts fresh (the reference skips it too)
            from ..models.import_torch import (load_carl_checkpoint,
                                               load_mvf_checkpoint)

            variables = {"params": merge_params(trainable, frozen),
                         "batch_stats": batch_stats}
            if cfg.MODEL.BASE_MODEL.NETWORK.startswith("TIMM-"):
                from ..models.carl import resolve_model_spec

                loaded = load_mvf_checkpoint(
                    cfg.MODEL.PRETRAINED_CHECKPOINT, variables,
                    depth=resolve_model_spec(cfg).vit_spec.depth,
                    optional_roots=("classifier",))
            else:
                loaded = load_carl_checkpoint(
                    cfg.MODEL.PRETRAINED_CHECKPOINT, variables,
                    cfg.MODEL.BASE_MODEL.LAYER,
                    optional_roots=("classifier",))
            logger.info("warm start from torch checkpoint %s",
                        cfg.MODEL.PRETRAINED_CHECKPOINT)
            batch_stats = loaded["batch_stats"]
            trainable, frozen = split_params(loaded["params"], cfg)
        elif cfg.MODEL.PRETRAINED_CHECKPOINT:
            # weights-only warm start (`models/__init__.py:50-59`): restore
            # the full checkpoint tree (orbax requires matching structure)
            # but keep only the model subtrees — the optimizer starts fresh
            template = {"trainable": trainable, "frozen": frozen,
                        "batch_stats": batch_stats,
                        "opt_state": self.tx.init(trainable)}
            restored = load_pretrained_params(
                cfg.MODEL.PRETRAINED_CHECKPOINT, template)
            trainable = restored["trainable"]
            frozen = restored["frozen"]
            batch_stats = restored.get("batch_stats", batch_stats)

        opt_state = self.tx.init(trainable)
        state = {"trainable": trainable, "frozen": frozen,
                 "batch_stats": batch_stats, "opt_state": opt_state}

        restored, start_epoch, start_iter = load_checkpoint(
            cfg.LOGDIR, state, include_mid=resume_mid)
        if restored is not None:
            state = restored
        self.state = replicate(self.mesh, state)
        self.start_epoch = start_epoch
        self.start_iter = start_iter
        return self.state

    @property
    def params(self):
        return merge_params(self.state["trainable"], self.state["frozen"])

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.state["batch_stats"]}

    # -- compiled steps ---------------------------------------------------

    def _augment_batch(self, key, batch):
        """On-device augmentation inside the step (`train.py:39-53`)."""
        cfg = self.cfg
        if cfg.SSL:
            videos = self._ssl_augment(key, batch["videos"], batch.get("dims"))
        else:
            B = batch["videos"].shape[0]
            keys = jax.random.split(key, B)
            vids = batch["videos"]
            if vids.dtype == jnp.uint8:
                vids = vids.astype(jnp.float32) / 255.0
            dims = batch.get("dims")
            if dims is None:  # no canvas padding: true extent is the frame
                H, W = vids.shape[-3], vids.shape[-2]
                dims = jnp.tile(jnp.asarray([H, W], jnp.float32), (B, 1))

            def one(k, v, hw):
                # true (h, w) extent threads into the RRC box + contrast mean
                # so the crop never samples canvas padding (the reference
                # augments unpadded tensors, `data_augment.py:416-441`)
                return supervised_augment(k, v, cfg.AUGMENTATION,
                                          cfg.IMAGE_SIZE, dims=(hw[0], hw[1]))

            videos = jax.vmap(one)(keys, vids, dims)
        return videos

    def build_train_step(self):
        cfg = self.cfg
        model, algo, tx = self.model, self.algo, self.tx

        @partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
        def train_step(state, batch, key, it, warmup_active, lr):
            # the per-step key folds INSIDE jit: an eager fold_in per step
            # costs ~4.5 ms of relay dispatch latency on the critical path
            # (measured r2); `it` rides along as a bundled scalar for free.
            # The leading fold_in(·, 0) tags the TRAIN stream — val tags 1 —
            # so the two streams are disjoint by construction for any it
            # (r2 verdict: the old +10M offset collided past epoch 100)
            key = jax.random.fold_in(jax.random.fold_in(key, 0), it)
            k_aug, k_drop = jax.random.split(key)
            videos = self._augment_batch(k_aug, batch)
            step_batch = dict(batch, videos=videos)

            def loss_fn(trainable):
                params = merge_params(trainable, state["frozen"])
                variables = {"params": params,
                             "batch_stats": state["batch_stats"]}
                loss_dict, updates = algo.compute_loss(
                    model, variables, step_batch, train=True,
                    rngs={"dropout": k_drop},
                    backbone_warmup_active=warmup_active)
                return loss_dict["loss"], (loss_dict, updates)

            (loss, (loss_dict, updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["trainable"])

            opt_state = state["opt_state"]
            opt_state = opt_state._replace(
                hyperparams={**opt_state.hyperparams,
                             "learning_rate": jnp.asarray(lr, jnp.float32)})
            up, opt_state = tx.update(grads, opt_state, state["trainable"])
            trainable = optax.apply_updates(state["trainable"], up)

            new_state = {"trainable": trainable, "frozen": state["frozen"],
                         "batch_stats": updates.get("batch_stats",
                                                    state["batch_stats"]),
                         "opt_state": opt_state}
            return new_state, _nan_to_zero(loss_dict)

        return train_step

    def build_val_step(self):
        model, algo = self.model, self.algo

        @jax.jit
        def val_step(state, batch, key, it):
            # stream tag 1 = validation (train tags 0): disjoint for any it
            key = jax.random.fold_in(jax.random.fold_in(key, 1), it)
            videos = self._augment_batch(key, batch)
            step_batch = dict(batch, videos=videos)
            params = merge_params(state["trainable"], state["frozen"])
            variables = {"params": params, "batch_stats": state["batch_stats"]}
            loss_dict, _ = algo.compute_loss(model, variables, step_batch,
                                             train=False)
            # augmented videos are returned for the TB video panel
            # (`train.py:217-224`); they stay device-side unless fetched
            return _nan_to_zero(loss_dict), videos

        return val_step

    # -- epochs -----------------------------------------------------------

    def _device_batch(self, batch):
        batch = {k: v for k, v in batch.items() if k != "names"}
        return shard_batch(self.mesh, batch)

    def _batch_stream(self, loader, depth: int):
        """Yields (dev_batch, names, h2d_seconds). depth > 0 runs the H2D
        device_put on a background thread with a `depth`-deep queue so the
        transfer overlaps step dispatch/compute (the prefetch-to-device
        stage of a production input pipeline — the reference's DataLoader
        workers overlap decode but its `.cuda()` H2D is on the hot loop,
        `train.py:119-125`). depth == 0 is the synchronous fallback."""
        if depth <= 0:
            for batch in loader:
                t0 = time.time()
                dev = self._device_batch(batch)
                yield dev, batch.get("names"), time.time() - t0
            return

        q: _queue.Queue = _queue.Queue(maxsize=depth)
        stop = threading.Event()

        def worker():
            try:
                for batch in loader:
                    if stop.is_set():
                        break
                    names = batch.get("names")
                    t0 = time.time()
                    dev = self._device_batch(batch)
                    q.put((dev, names, time.time() - t0))
                q.put(None)
            except BaseException as e:  # surfaced to the consumer
                q.put(e)

        th = threading.Thread(target=worker, daemon=True, name="h2d-prefetch")
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while th.is_alive():  # unblock a worker stuck on q.put
                try:
                    q.get_nowait()
                except _queue.Empty:
                    pass
                th.join(timeout=0.05)

    def train_one_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        warmup_active = False
        if cfg.TRAIN.BACKBONE_WARMUP is not None:
            if cfg.MODEL.EMBEDDER_MODEL.FUSION_TYPE != "smart":
                raise ValueError("BACKBONE_WARMUP requires smart fusion "
                                 "(`train.py:81-85`)")
            warmup_active = epoch < cfg.TRAIN.BACKBONE_WARMUP

        if self._train_step is None:
            self._train_step = self.build_train_step()
        self.train_loader.set_epoch(epoch)
        lr = learning_rate_for_epoch(cfg, epoch)

        # VRL_PROFILE=<dir>: capture a jax.profiler trace of this epoch
        # (upgrade over the reference's wall-clock-only markers, SURVEY.md §5)
        import os as _os

        profile_dir = _os.environ.get("VRL_PROFILE")
        if profile_dir and epoch == self.start_epoch:
            import jax.profiler as _prof

            _prof.start_trace(profile_dir)
            self._profiling = True

        # Mid-epoch (preemption) resume: consume the loader up to the saved
        # iteration WITHOUT stepping — the per-epoch deterministic shuffle,
        # the iter-folded RNG stream, and the epoch-pure LR make the resumed
        # trajectory bit-identical to an uninterrupted run.
        skip_until = self.start_iter if epoch == self.start_epoch else 0
        self.start_iter = 0
        save_n = int(getattr(cfg.CHECKPOINT, "SAVE_EVERY_N_ITERS", 0) or 0)

        data_size = len(self.train_loader)
        total_loss: Dict[str, float] = {}
        loss_dicts = []  # device scalars; fetched lazily so steps pipeline
        tmt = {i: 0.0 for i in range(10)}
        tmc = 0
        # depth > 0: H2D runs on a prefetch thread, so marker 0 is the whole
        # input-pipeline wait (decode+collate+transfer behind the queue) and
        # marker 1 reports the overlapped transfer time (informational, off
        # the critical path). depth == 0 restores the reference's serial
        # marker semantics exactly.
        depth = int(cfg.get_path("DATA.DEVICE_PREFETCH", 2) or 0)
        t1 = time.time()
        for cur_iter, (dev_batch, names, h2d_s) in enumerate(
                self._batch_stream(self.train_loader, depth)):
            if cur_iter < skip_until:
                t1 = time.time()
                continue
            tmc += 1
            wait = time.time() - t1
            tmt[0] += wait if depth > 0 else max(wait - h2d_s, 0.0)
            tmt[1] += h2d_s
            t1 = time.time()

            self.state, loss_dict = self._train_step(
                self.state, dev_batch, self._base_key,
                epoch * 100_000 + cur_iter, warmup_active, lr)
            loss_dicts.append(loss_dict)
            tmt[2] += time.time() - t1
            t1 = time.time()

            if cur_iter % cfg.LOGGING.REPORT_INTERVAL == 0:
                # fetching the value synchronizes up to this step
                logger.info("iter %d, training loss: %.3f",
                            data_size * epoch + cur_iter,
                            float(loss_dict["loss"]))
            if save_n > 0 and (cur_iter + 1) % save_n == 0 and is_root_proc():
                # device_get synchronizes the pipeline up to this step; keep
                # SAVE_EVERY_N_ITERS large enough to amortize in production
                save_mid_checkpoint(cfg.LOGDIR, jax.device_get(self.state),
                                    epoch, cur_iter + 1)
            tmt[5] += time.time() - t1
            t1 = time.time()

        for loss_dict in jax.device_get(loss_dicts):
            for k, v in loss_dict.items():
                total_loss[k] = total_loss.get(k, 0.0) + float(v) / data_size

        # per-iteration marker means, kept for callers (bench.py loader-fed
        # overlap measurement) — marker 2 is step DISPATCH only (steps are
        # async; device completion lands in the device_get above)
        self.last_markers = {i: tmt[i] / max(tmc, 1) for i in range(10)
                             if tmt[i] > 0.0}
        for i, v in self.last_markers.items():
            print("marker %i: %f" % (i, v))
        print("loops: %i" % tmc)

        if getattr(self, "_profiling", False):
            import jax.profiler as _prof

            _prof.stop_trace()
            self._profiling = False
            logger.info("profiler trace written to %s",
                        _os.environ.get("VRL_PROFILE"))

        if self.summary_writer is not None:
            self.summary_writer.add_scalar("train/learning_rate", lr, epoch)
            for k, v in total_loss.items():
                self.summary_writer.add_scalar(f"train/{k}", v, epoch)
        logger.info("epoch %d, train loss: %.3f", epoch, total_loss.get("loss", 0.0))
        return total_loss

    def val_one_epoch(self, epoch: int) -> Dict[str, float]:
        if self._val_step is None:
            self._val_step = self.build_val_step()
        data_size = len(self.val_loader)
        total_loss: Dict[str, float] = {}
        last_videos = last_names = None
        loss_dicts = []  # stay on device; one device_get after the loop
        for cur_iter, batch in enumerate(self.val_loader):
            dev_batch = self._device_batch(batch)
            loss_dict, videos = self._val_step(self.state, dev_batch,
                                               self._base_key, cur_iter)
            loss_dicts.append(loss_dict)
            last_videos, last_names = videos, batch.get("names")
        for loss_dict in jax.device_get(loss_dicts):
            for k, v in loss_dict.items():
                total_loss[k] = total_loss.get(k, 0.0) + float(v) / data_size
        self._log_val_video_panels(last_videos, last_names)
        if self.summary_writer is not None:
            for k, v in total_loss.items():
                self.summary_writer.add_scalar(f"val/{k}", v, epoch)
        logger.info("epoch %d, val loss: %.3f", epoch, total_loss.get("loss", 0.0))
        return total_loss

    def _log_val_video_panels(self, videos, names):
        """TB video panels of the last val batch's augmented views
        (`train.py:217-224`: single-process gate, first batch item, every 2nd
        frame, unnormalized; the analogous train-loop panel at
        `train.py:163-168` is commented out in the reference)."""
        if (self.summary_writer is None or videos is None
                or jax.process_count() != 1):
            return
        from ..data import unnorm

        # fp32 at the host boundary: under AMP the augment kernel emits bf16
        # frames, which numpy/torch video writers can't ingest directly
        item = np.asarray(jax.device_get(videos)).astype(np.float32)[0]  # (V, T, S, S, 3) | (T, S, S, 3)
        tag = f"{tuple(names)}" if names is not None else "val_batch"
        if self.cfg.SSL:
            for i, view in enumerate(item):
                arr = unnorm(view[::2].transpose(0, 3, 1, 2))
                self.summary_writer.add_video(f"{tag}_view{i}", arr[None], 0,
                                              fps=4)
        else:
            arr = unnorm(item[::2].transpose(0, 3, 1, 2))
            self.summary_writer.add_video(tag, arr[None], 0, fps=4)

    # -- full fit loop (`train.py:309-339`) -------------------------------

    def fit(self, evaluate_fn=None):
        cfg = self.cfg
        if self.state is None:
            self.init_state()
        for epoch in range(self.start_epoch, cfg.TRAIN.MAX_EPOCHS):
            logger.info("Training epoch %d/%d, %d iters each epoch",
                        epoch, cfg.TRAIN.MAX_EPOCHS, len(self.train_loader))
            t0 = time.time()
            self.train_one_epoch(epoch)
            print("train done in (m): " + str((time.time() - t0) / 60.0))

            last = epoch == cfg.TRAIN.MAX_EPOCHS - 1
            if is_root_proc() and ((epoch + 1) % cfg.CHECKPOINT.SAVE_INTERVAL == 0
                                   or last):
                save_checkpoint(cfg.LOGDIR, jax.device_get(self.state), epoch)
            if not self.no_eval and ((epoch + 1) % cfg.EVAL.VAL_INTERVAL == 0
                                     or last):
                self.val_one_epoch(epoch)
                if evaluate_fn is not None:
                    t0 = time.time()
                    evaluate_fn(self, epoch)
                    print("evaluate_once done in (m): " + str((time.time() - t0) / 60.0))
