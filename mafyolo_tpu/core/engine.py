"""Trainer state machine (parity target: yolov6/core/engine.py:31-615).

Orchestrates: loader build, model+state init, resume, the jitted train step with
warmup/accumulation schedule, mosaic shutoff near the end (engine.py:331-336),
per-epoch EMA eval + checkpointing with best tracking (engine.py:169-237).

Data parallelism: mesh-sharded batches into one jit step (see parallel/mesh.py);
per-host loader sharding replaces DistributedSampler.
"""
from __future__ import annotations

import os
import os.path as osp
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mafyolo_tpu.core.evaler import run_eval
from mafyolo_tpu.core.flatten import make_flatteners
from mafyolo_tpu.core.train_state import (flatten_into_state, init_train_state,
                                          make_train_step)
from mafyolo_tpu.data import create_dataloader
from mafyolo_tpu.models import build_model
from mafyolo_tpu.parallel.mesh import data_sharding, is_main_process, make_mesh
from mafyolo_tpu.solver.build import build_lr_fn, warmup_schedule
from mafyolo_tpu.utils.checkpoint import (find_latest_checkpoint, load_checkpoint,
                                          load_shape_matched, save_checkpoint)
from mafyolo_tpu.utils.events import LOGGER


class Trainer:
    def __init__(self, args, cfg, data_dict: Dict, mesh=None):
        self.args = args
        self.cfg = cfg
        self.data_dict = data_dict
        self.img_size = args.img_size
        self.batch_size = args.batch_size          # global batch
        self.epochs = args.epochs
        self.nc = int(data_dict["nc"])
        self.save_dir = args.save_dir
        os.makedirs(self.save_dir, exist_ok=True)

        self.mesh = mesh if mesh is not None else make_mesh()
        self.world_size = self.mesh.devices.size * max(1, jax.process_count())
        if self.batch_size % self.mesh.devices.size:
            raise ValueError(
                "device count must divide the global batch size")

        if cfg.model.get("build_type", "yaml") != "yaml":
            # legacy office path: EfficientRep+RepPANNeck+effidehead emitted
            # as a graph spec (models/office.py; reference yolo.py:166-172)
            from mafyolo_tpu.models.office import office_graph
            self.graph = office_graph(
                cfg.model, getattr(cfg, "training_mode", "repvgg"))
        else:
            self.graph = getattr(cfg.model, "graph", None) or cfg.model.get(
                "yaml_file", "maf-yolo-n")
        dtype = jnp.bfloat16 if getattr(args, "bf16", True) and \
            jax.default_backend() != "cpu" else jnp.float32
        # cfg.training_mode == 'repopt' trains the plain (RealVGG) graph under
        # gradient masks instead of the multi-branch RepVGG blocks
        # (reference engine.py:60-63, RepOptimizer.py:84-152)
        self.training_mode = cfg.get("training_mode", "repvgg")
        # remat default OFF (round 3): with the custom DW-conv VJP the
        # whole-graph backward now compiles to 167MB (the round-1 multi-GB
        # blowup came from XLA's native depthwise grad lowering), and
        # skipping the per-block recompute cuts fwd+loss+grad 197 -> 169 ms
        # (bs32@640, N). --remat turns it back on for memory-tight configs.
        self.model = build_model(self.graph, nc=self.nc,
                                 reg_max=cfg.model.head.reg_max,
                                 strides=tuple(cfg.model.head.strides),
                                 remat=bool(getattr(args, "remat", False)),
                                 plain_rep=self.training_mode == "repopt",
                                 dtype=dtype)

        # solver scaling rules (engine.py:491-496)
        solver = cfg.solver
        accumulate = max(1, round(64 / self.batch_size))
        self.weight_decay = solver.weight_decay * self.batch_size * accumulate / 64
        self.lr0 = solver.lr0 * self.batch_size / (self.world_size * 32)
        self.lf = build_lr_fn(solver.lr_scheduler, solver.lrf, self.epochs)

        # data
        hyp = dict(cfg.data_aug)
        self.device_aug = None
        host_augment = True
        if getattr(args, "device_aug", False):
            # device-side affine/HSV/flip: host loader runs letterbox-only
            self.device_aug = dict(
                degrees=float(hyp.get("degrees", 0.0)),
                translate=float(hyp.get("translate", 0.1)),
                scale=float(hyp.get("scale", 0.5)),
                shear=float(hyp.get("shear", 0.0)),
                hsv_h=float(hyp.get("hsv_h", 0.015)),
                hsv_s=float(hyp.get("hsv_s", 0.7)),
                hsv_v=float(hyp.get("hsv_v", 0.4)),
                fliplr=float(hyp.get("fliplr", 0.5)),
                flipud=float(hyp.get("flipud", 0.0)),
                # in-batch device mosaic (data/device_aug.py): the host only
                # decodes+letterboxes one image per sample (measured 205 img/s
                # vs 40 img/s for the full host pipeline on a 1-core host)
                mosaic=float(hyp.get("mosaic", 0.0)),
                # cached-mosaic mixup + dynamic mixup (reference
                # datasets.py:166-178), blended with another sample's mosaic
                mixup=float(hyp.get("mixup", 0.0)),
                dy_label=int(hyp.get("dy_label", 5)),
                dy_mixup=float(hyp.get("dy_mixup", 0.0)))
            host_augment = False
        self.train_loader, self.train_dataset = create_dataloader(
            data_dict["train"], self.img_size, self.batch_size, stride=32, hyp=hyp,
            augment=host_augment, workers=args.workers, shuffle=True, seed=args.seed,
            max_labels=getattr(args, "max_labels", 120),
            use_processes=getattr(args, "loader_processes", False),
            shard_id=jax.process_index(), num_shards=max(1, jax.process_count()))
        self.max_stepnum = len(self.train_loader)
        self.warmup_stepnum = max(
            round(solver.warmup_epochs * self.max_stepnum), 1000) \
            if solver.warmup_epochs else 0

        # state (hot buffers flat, see core/flatten.py; checkpoints stay pytrees)
        self._pf, self._sf, _ = make_flatteners(self.model, self.img_size)
        state = init_train_state(self.model, jax.random.PRNGKey(args.seed),
                                 self.img_size)
        if getattr(args, "pretrained", None):
            ckpt = load_checkpoint(args.pretrained)
            matched = load_shape_matched(
                self._pf.unflatten(state["params"]), ckpt["model"]["params"])
            state = flatten_into_state(
                self.model, self.img_size, state, params=matched,
                ema={"params": matched,
                     "batch_stats": self._sf.unflatten(
                         state["ema"]["batch_stats"])})
        self.grad_mask = None
        if self.training_mode == "repopt":
            # scales from the hyper-search checkpoint (engine.py:465-472);
            # reinit only when training from scratch (engine.py:62)
            from mafyolo_tpu.solver.repopt import load_scales, repopt_prepare
            scales_path = cfg.model.get("scales")
            if not scales_path:
                raise ValueError(
                    "training_mode='repopt' needs cfg.model.scales "
                    "(hyper-search checkpoint with LinearAddBlock scales)")
            scales = load_scales(scales_path)
            params = self._pf.unflatten(state["params"])
            params, mask_tree = repopt_prepare(
                params, scales, np.random.default_rng(args.seed),
                reinit=not getattr(args, "pretrained", None))
            state = flatten_into_state(
                self.model, self.img_size, state, params=params,
                ema={"params": params,
                     "batch_stats": self._sf.unflatten(
                         state["ema"]["batch_stats"])})
            self.grad_mask = self._pf.flatten(mask_tree)
            LOGGER.info(f"repopt: {len(scales)} plain RepVGG convs "
                        f"re-initialized and grad-masked")
        self.start_epoch = 0
        if getattr(args, "resume", None):
            path = args.resume if isinstance(args.resume, str) else \
                find_latest_checkpoint(self.save_dir)
            if path:
                ckpt = load_checkpoint(path)
                state = flatten_into_state(
                    self.model, self.img_size, state,
                    params=ckpt["model"]["params"],
                    ema=ckpt.get("ema") or None, mom=ckpt.get("opt"))
                state["batch_stats"] = ckpt["model"]["batch_stats"]
                state["updates"] = jnp.asarray(ckpt.get("updates", 0), jnp.int32)
                state["wiou_mean"] = jnp.asarray(ckpt.get("wiou_mean", 1.0),
                                                 jnp.float32)
                self.start_epoch = int(ckpt.get("epoch", -1)) + 1
                LOGGER.info(f"resumed from {path} at epoch {self.start_epoch}")
        from jax.sharding import NamedSharding, PartitionSpec as P
        self.state = jax.device_put(state, NamedSharding(self.mesh, P()))

        loss_type = "simota" if (getattr(args, "simota", False)
                                 or cfg.model.get("target") == "SimOTA") else "tal"
        teacher = None
        if getattr(args, "distill", False):
            # teacher model for knowledge distillation (engine.py:451-462)
            t_ckpt = load_checkpoint(args.teacher_model_path)
            t_meta = t_ckpt.get("meta", {})
            t_graph = t_meta.get("graph", self.graph)
            from mafyolo_tpu.utils.checkpoint import eval_variables
            t_model = build_model(t_graph, nc=self.nc,
                                  reg_max=cfg.model.head.reg_max,
                                  strides=tuple(cfg.model.head.strides),
                                  dtype=dtype)
            t_vars = jax.device_put(eval_variables(t_ckpt))
            teacher = (t_model, t_vars)
            loss_type = "distill"
        def mk_train_step(device_aug):
            return make_train_step(
                self.model, num_classes=self.nc, img_size=self.img_size,
                strides=tuple(cfg.model.head.strides),
                reg_max=cfg.model.head.reg_max,
                use_dfl=cfg.model.head.use_dfl, iou_type=cfg.model.head.iou_type,
                weight_decay=self.weight_decay, mesh=self.mesh,
                loss_type=loss_type, device_aug=device_aug, seed=args.seed,
                teacher=teacher, grad_mask=self.grad_mask,
                max_epoch=self.epochs,
                distill_feat=bool(getattr(args, "distill_feat", False)),
                temperature=float(getattr(args, "temperature", 20.0)))
        self._mk_train_step = mk_train_step
        self.train_step = mk_train_step(self.device_aug)
        self._data_sh = data_sharding(self.mesh)

        self.warmup_epoch_loss = int(getattr(cfg.model.head, "atss_warmup_epoch", 3))
        self.stop_aug_last_n_epoch = int(getattr(args, "stop_aug_last_n_epoch", 15))
        self.eval_interval = int(getattr(args, "eval_interval", 20))
        self.heavy_eval_range = int(getattr(args, "heavy_eval_range", 50))
        self.best_ap = 0.0
        self.best_stop_aug_ap = 0.0
        self.ap = 0.0
        self.last_opt_step = -1
        self.tb = None
        if is_main_process() and getattr(args, "tensorboard", True):
            try:
                from torch.utils.tensorboard import SummaryWriter  # noqa
                self.tb = SummaryWriter(self.save_dir)
            except Exception:
                try:
                    from tensorboardX import SummaryWriter
                    self.tb = SummaryWriter(self.save_dir)
                except Exception:
                    LOGGER.info("tensorboard writer unavailable; skipping")
        # optional wandb mirror of the TB scalars (reference engine.py:33-35,
        # args.wandb); the package is not installed in offline envs -> gated
        self.wandb = None
        if is_main_process() and getattr(args, "wandb", False):
            try:
                import wandb
                self.wandb = wandb
                wandb.init(project=getattr(args, "wandb_project", "mafyolo-tpu"),
                           dir=self.save_dir, config=vars(args))
            except Exception as e:  # noqa: BLE001
                LOGGER.warning(f"wandb unavailable ({e}); continuing without")

    def _log_scalar(self, key: str, value, step: int):
        if self.tb:
            self.tb.add_scalar(key, value, step)
        if self.wandb:
            self.wandb.log({key: value}, step=step)

    # ---------- epoch orchestration ----------

    def train(self):
        t0 = time.time()
        try:
            for epoch in range(self.start_epoch, self.epochs):
                self.train_one_epoch(epoch)
                self.eval_and_save(epoch)
            LOGGER.info(f"training done in {(time.time() - t0) / 3600:.2f}h; "
                        f"best AP {self.best_ap:.4f}")
            self.strip_models()
        except Exception:
            LOGGER.error("training failed")
            raise
        return self.best_ap

    def strip_models(self):
        """Post-train optimizer strip (engine.py:364-368 strip_optimizer): after
        the final epoch, promote EMA->model and drop opt state in the saved
        best/last/stop-aug checkpoints, halving them for deployment."""
        from mafyolo_tpu.utils.checkpoint import strip_checkpoint
        for name in ("best_ckpt", "last_ckpt", "best_stop_aug_ckpt"):
            path = osp.join(self.save_dir, f"{name}.npck")
            if osp.exists(path):
                strip_checkpoint(path)

    def prepare_for_steps(self, epoch: int):
        """Aug shutoff near the end (engine.py:328-345): rebuild the loader with
        mosaic/mixup disabled for the last stop_aug_last_n_epoch epochs. In
        device-aug mode the jitted step bakes the mosaic prob in, so the step
        is rebuilt too (one extra compile at the boundary)."""
        if (epoch == self.epochs - self.stop_aug_last_n_epoch
                and self.device_aug and self.device_aug.get("mosaic")):
            self.device_aug = dict(self.device_aug, mosaic=0.0)
            LOGGER.info("disabling device mosaic for the stop-aug tail")
            self.train_step = self._mk_train_step(self.device_aug)
        if epoch == self.epochs - self.stop_aug_last_n_epoch:
            hyp = dict(self.cfg.data_aug)
            hyp.update(mosaic=0.0, mixup=0.0, dy_mixup=0.0)
            LOGGER.info("disabling mosaic/mixup for the stop-aug tail")
            self.train_loader, self.train_dataset = create_dataloader(
                self.data_dict["train"], self.img_size, self.batch_size, stride=32,
                hyp=hyp, augment=True, workers=self.args.workers, shuffle=True,
                seed=self.args.seed,
                use_processes=getattr(self.args, "loader_processes", False),
                max_labels=getattr(self.args, "max_labels", 120),
                shard_id=jax.process_index(),
                num_shards=max(1, jax.process_count()))
        self.train_loader.set_epoch(epoch)

    def train_one_epoch(self, epoch: int):
        self.prepare_for_steps(epoch)
        solver = self.cfg.solver
        use_atss = epoch < self.warmup_epoch_loss
        running = None
        t_start = time.time()
        n_imgs = 0
        for step, (imgs, targets, _) in enumerate(self.train_loader):
            curr_step = step + self.max_stepnum * epoch
            sched = warmup_schedule(
                curr_step, self.warmup_stepnum, epoch, self.lf, self.lr0,
                self.batch_size, solver.warmup_bias_lr, solver.warmup_momentum,
                solver.momentum)
            do_apply = (curr_step - self.last_opt_step) >= sched["accumulate"]
            if do_apply:
                self.last_opt_step = curr_step
            # device-trace hook (SURVEY 5.1; the torch_utils.time_sync analog
            # for whole-step profiling): steps 2-7 of the first epoch
            if getattr(self.args, "profile", False) and epoch == self.start_epoch:
                if step == 2:
                    jax.profiler.start_trace(osp.join(self.save_dir, "profile"))
                    LOGGER.info("jax.profiler trace started (steps 2-7)")
                elif step == 7:
                    jax.profiler.stop_trace()
                    LOGGER.info(f"profiler trace -> {self.save_dir}/profile")
            if (step == 0 and self.tb and is_main_process()
                    and epoch % max(1, self.eval_interval) == 0):
                # first-batch visualization on eval epochs (engine.py:504-558;
                # every-epoch plotting measurably drags a 1-core host)
                from mafyolo_tpu.utils.plots import plot_train_batch
                grid = plot_train_batch(imgs, targets,
                                        names=self.data_dict.get("names"))
                self.tb.add_image("train_batch", grid[:, :, ::-1], epoch,
                                  dataformats="HWC")
            imgs_dev = jax.device_put(imgs, self._data_sh)
            tgt_dev = jax.device_put(targets.astype(np.float32), self._data_sh)
            self.state, metrics = self.train_step(
                self.state, imgs_dev, tgt_dev,
                jnp.float32(sched["lr_bnw"]), jnp.float32(sched["lr_weight"]),
                jnp.float32(sched["lr_bias"]), jnp.float32(sched["momentum"]),
                jnp.bool_(do_apply), use_atss, jnp.float32(epoch))
            n_imgs += imgs.shape[0]
            # metrics stay on device between logs: each host fetch is a full
            # roundtrip (~30ms over a tunneled chip) that would gate every step
            if step % 50 == 0 and is_main_process():
                vals = {k: float(v) for k, v in metrics.items()}
                running = vals if running is None else {
                    k: 0.5 * running[k] + 0.5 * vals[k] for k in vals}
                ips = n_imgs / max(time.time() - t_start, 1e-9)
                LOGGER.info(
                    f"epoch {epoch} step {step}/{self.max_stepnum} "
                    + " ".join(f"{k}={v:.4f}" for k, v in running.items())
                    + f" lr={sched['lr_weight']:.5f} img/s={ips:.1f}")
        if (self.tb or self.wandb) and running:
            for k, v in running.items():
                self._log_scalar(f"train/{k}", v, epoch)
            self._log_scalar("train/lr", sched["lr_weight"], epoch)
            self._log_scalar("train/images_per_sec",
                             n_imgs / max(time.time() - t_start, 1e-9), epoch)
        return running

    # ---------- eval + checkpoint ----------

    def _should_eval(self, epoch: int) -> bool:
        if epoch == self.epochs - 1:
            return True
        remaining = self.epochs - 1 - epoch
        if remaining < self.heavy_eval_range:
            return (epoch + 1) % max(1, self.eval_interval // 7) == 0
        return (epoch + 1) % self.eval_interval == 0

    def eval_and_save(self, epoch: int):
        if not is_main_process():
            return
        do_eval = self._should_eval(epoch) and "val" in self.data_dict
        # pulling ~100MB of state off a tunneled chip is expensive; only
        # materialize a checkpoint when we will actually write one
        save_interval = int(getattr(self.args, "save_interval", 1))
        will_save = (do_eval or epoch % max(1, save_interval) == 0
                     or epoch >= self.epochs - self.stop_aug_last_n_epoch
                     or epoch == self.epochs - 1)
        if not will_save:
            return
        ema_vars = {
            "params": self._pf.unflatten(self.state["ema"]["params"]),
            "batch_stats": self._sf.unflatten(
                self.state["ema"]["batch_stats"])}
        ckpt = {
            "model": {"params": self._pf.unflatten(self.state["params"]),
                      "batch_stats": self.state["batch_stats"]},
            "ema": ema_vars,
            "opt": self._pf.unflatten(self.state["mom"]),
            "updates": int(self.state["updates"]),
            "wiou_mean": float(self.state["wiou_mean"]),
            "epoch": epoch,
            "meta": {"graph": self.graph, "nc": self.nc,
                     "img_size": self.img_size,
                     "reg_max": int(self.cfg.model.head.reg_max),
                     "strides": list(self.cfg.model.head.strides)},
        }
        if do_eval:
            # rect=True matches the reference's mid-train protocol (its Evaler
            # builds a rect loader, yolov6/core/evaler.py:115-133) so per-epoch
            # AP tracks the final eval protocol
            def log_vis(imgs_rgb):
                if self.tb:
                    for vi, im in enumerate(imgs_rgb):
                        self.tb.add_image(f"val_pred/{vi}", im, epoch,
                                          dataformats="HWC")

            metrics = run_eval(
                self.graph, ema_vars, self.nc, self.data_dict, folded=False,
                img_size=self.img_size, rect=True,
                batch_size=min(self.batch_size * 2, 64), task="val",
                half=jax.default_backend() != "cpu",
                workers=self.args.workers,
                on_vis=log_vis if self.tb else None)
            self.ap = metrics.get("AP", 0.0)
            if self.tb or self.wandb:
                for k, v in metrics.items():
                    self._log_scalar(f"val/{k}", v, epoch)
        is_best = self.ap > self.best_ap
        self.best_ap = max(self.ap, self.best_ap)
        save_checkpoint(ckpt, is_best, self.save_dir, "last_ckpt")
        if epoch >= self.epochs - self.stop_aug_last_n_epoch:
            if self.ap > self.best_stop_aug_ap:
                self.best_stop_aug_ap = self.ap
                save_checkpoint(ckpt, False, self.save_dir, "best_stop_aug_ckpt")
        if is_best:
            LOGGER.info(f"new best AP {self.best_ap:.4f} at epoch {epoch}")
