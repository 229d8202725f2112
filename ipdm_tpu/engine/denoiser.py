"""Progressive dual-domain denoiser orchestrator — the framework's L4 engine.

TPU-native equivalent of the reference `progressive_domain_denoiser`
(Utils/train_test_utils.py:121-828) with the identical public surface:
fit / train / test / proj_denoiser / img_denoiser / progressive_denoiser /
update_opt / reset_opt / data_sample_load / result_figure_save /
result_data_save / metric_calculate / metric_update / metric_total_save, and
the identical on-disk artifact layout (save_models/option.json,
save_test_results/Save_Iter_N/<patient>/<slice>/{metric.json, *.png, *.npz}).

Execution redesign (see SURVEY.md §7):
  * the models are Flax param trees + jitted apply; training is one donated
    jit step (engine.trainer), optionally batch-sharded over a Mesh
    (parallel.mesh);
  * the guided reverse processes run as jitted lax.scan's (diffusion.guided) —
    no per-step host traffic;
  * the domain convertors are on-device (recon.convertor): results stay on
    the TPU across proj-stage → convert → img-stage; only saved artifacts are
    ever copied to host.

Data layout: device tensors are NHWC [B, H, W, 1]; saved result arrays are
transposed to the reference's NCHW [B, 1, H, W] so .npz artifacts and figure
code are drop-in comparable.
"""

from __future__ import annotations

import copy
import json
import os
import os.path as osp
from datetime import datetime
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipdm_tpu.config.config import IPDMConfig, cfg_load
from ipdm_tpu.data.dataset import SiemensDatasetNpz
from ipdm_tpu.data.sampler import DataLoader, RandomSampler
from ipdm_tpu.data.units import miu2pixel
from ipdm_tpu.diffusion.diffusion import GaussianDiffusion
from ipdm_tpu.diffusion.guided import (ModelApply, guided_reverse_process,
                                       sparse_guided_reverse_process)
from ipdm_tpu.diffusion.normalize import (yeo_johnson_inverse_transform,
                                          yeo_johnson_transform)
from ipdm_tpu.engine.checkpoint import CheckpointManager
from ipdm_tpu.engine.logging import LoggerX, ScalarWriter
from ipdm_tpu.engine.trainer import (TrainState, flatten_patches,
                                     make_optimizer, make_train_step)
from ipdm_tpu.models.unet import build_unet
from ipdm_tpu.ops.lambda_curve import curve_init, proj_curve_init
from ipdm_tpu.utils.profiling import PhaseTimer
from ipdm_tpu.ops.sharpen import tensor_sharpen
from ipdm_tpu.recon.convertor import Convertor


class DotDict(dict):
    """Attr-access dict (reference train_test_utils.py:30-43)."""

    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__

    def __getattr__(self, item):
        try:
            value = self[item]
        except KeyError as e:
            raise AttributeError(item) from e
        if isinstance(value, dict) and not isinstance(value, DotDict):
            value = DotDict(value)
        return value


class ResultTempDict(DotDict):
    """Ordered iter_N result store with int indexing
    (reference train_test_utils.py:45-56)."""

    def __getitem__(self, item):
        if isinstance(item, int):
            if item == -1:
                return self[f"iter_{len(self)}"]
            return self[f"iter_{item}"]
        return super().__getitem__(item)


# -- recursive mean/std aggregation (reference train_test_utils.py:59-118) --

def dict_add(d1, d2, d):
    for key in d2.keys():
        if isinstance(d2[key], dict):
            if key not in d1:
                d1[key] = dict()
                d[key] = dict()
            dict_add(d1[key], d2[key], d[key])
        else:
            if key not in d1:
                d1[key] = 0
                d[key] = 0
            d1[key] += d2[key]
            d[key] += 1


def dict_mean(d1, d):
    for key in d1.keys():
        if isinstance(d1[key], dict):
            dict_mean(d1[key], d[key])
        else:
            d1[key] /= d[key]


def dict_value_minus_mean_square(d1, d_mean, d):
    for key in d1.keys():
        if isinstance(d1[key], dict):
            if key not in d:
                d[key] = dict()
            dict_value_minus_mean_square(d1[key], d_mean[key], d[key])
        else:
            if key + "_std" not in d_mean:
                d_mean[key + "_std"] = 0
                d[key + "_std"] = 0
            d_mean[key + "_std"] += (d1[key] - d_mean[key]) ** 2
            d[key + "_std"] += 1


def dict_std(d1, d):
    for key in d1.keys():
        if isinstance(d1[key], dict):
            dict_std(d1[key], d[key])
        else:
            if "std" in key:
                d1[key] = (d1[key] / d[key]) ** 0.5 if d[key] >= 1 else 0
    return d1


def _to_nchw(x) -> np.ndarray:
    """Device NHWC [B,H,W,1] → host NCHW [B,1,H,W] numpy (artifact layout)."""
    return np.asarray(x).transpose(0, 3, 1, 2)


_WINDOW = ((-160 + 1024) / 4096, (240 + 1024) / 4096)  # fixed display window


class ProgressiveDomainDenoiser:
    """The train/test engine. Construct with an IPDMConfig; call .fit()."""

    def __init__(self, opt: IPDMConfig, result_save_path: Optional[str] = None):
        self.trans_ldproj = None
        self.trans_ldimg = None
        self.opt = opt
        self.opt_temp = copy.deepcopy(opt)
        timestamp = "{0:%Y-%m-%dT%H-%M-%S}".format(datetime.now())
        if result_save_path is None:
            save_root = osp.join(os.getcwd(), "ModelTrainLog",
                                 f"{opt.model_name}_{opt.run_name}", timestamp)
        else:
            save_root = osp.join(result_save_path,
                                 f"{opt.model_name}_{opt.run_name}")
        self.save_root = save_root
        self.logger = LoggerX(save_root, opt)
        self.ckpt = CheckpointManager(self.logger.models_save_dir)
        self.rank = jax.process_index()
        self.logger.save_option(self.opt)
        self.summer = (ScalarWriter(osp.join(save_root, "trainSummary"))
                       if "train" in opt.mode else None)

        self.rng = jax.random.PRNGKey(opt.seed)

        # Device mesh (SURVEY §5.8): one mesh serves training (batch dp over
        # 'data') AND inference (the UNet evals' H axis sharded over ALL
        # axes for per-slice latency scaling; the reference has no
        # counterpart — its torch.distributed hooks are never initialised).
        if opt.mesh_shape:
            from ipdm_tpu.parallel import make_mesh
            self.mesh = make_mesh(opt.mesh_shape, ("data", "view"))
            # GSPMD cannot partition the fused planar pallas units
            # (custom calls): under a mesh the samplers trace with the
            # kernel off — the per-channel XLA lowering partitions fine
            # (halo exchanges/psums inserted automatically).
            from ipdm_tpu.models import unet as _unet
            if _unet.PLANAR_FUSED == "auto":
                _unet.PLANAR_FUSED = "0"
        else:
            self.mesh = None

        # Section: models per mode (train_test_utils.py:146-168)
        self.proj_model = None
        self.proj_params = None
        self.img_model = None
        self.img_params = None
        self.optimizer = None
        self.train_state: Optional[TrainState] = None
        self._train_domain = None

        if opt.mode in ("train_proj", "test_proj", "test_prog"):
            self.init_proj_model()
            if opt.mode == "train_proj":
                self._train_domain = "proj"
        self.init_convertor(opt.convertor)
        if opt.mode in ("train_img", "test_img", "test_prog"):
            self.init_img_model()
            if opt.mode == "train_img":
                self._train_domain = "img"

        if self._train_domain is not None:
            self._init_training()
        self.load_model()
        if self.mesh is not None and "test" in opt.mode:
            # inference under the mesh: params replicate, sample inputs
            # shard their H axis (data_sample_load) — XLA SPMD compiles the
            # guided samplers with conv halo exchanges / GN psums /
            # attention all-gathers over ICI
            self.img_params = self._replicate(self.img_params)
            self.proj_params = self._replicate(self.proj_params)

        # Section: data
        self.init_data_loader()
        self.fdct = None
        self.fdproj = None
        self.ldct = None
        self.ldct_np = None
        self.ldproj = None
        self.ldproj_np = None

        # Section: result temps
        self.proj_denoise_result = ResultTempDict()
        self.proj_denoise_convert2img_result = ResultTempDict()
        self.img_denoise_result = ResultTempDict()
        self.progressive_denoise_result = ResultTempDict()
        self.noise_strength = None
        # Section: λ curves
        self.img_lambda_curve = curve_init()
        self.proj_lambda_curve = proj_curve_init()
        # Section: metrics
        self.metric_clear()
        self.metric_total = DotDict()
        self.metric_each_sample = []

        self.save_root_path = osp.join(save_root, "save_test_results")
        os.makedirs(self.save_root_path, exist_ok=True)
        # per-phase wall-clock profiling (SURVEY.md §5.1; absent upstream)
        self.timer = PhaseTimer()

    # -- config mutation (train_test_utils.py:202-211) ----------------------

    def update_opt(self, ultra_cfg=None):
        if ultra_cfg is not None:
            cfg_load(ultra_cfg, self.opt.__dict__)
            self.logger.save_option(self.opt)
            if "convertor" in ultra_cfg:
                self.init_convertor(ultra_cfg["convertor"])

    def reset_opt(self):
        self.opt = copy.deepcopy(self.opt_temp)

    # -- model/convertor init ----------------------------------------------

    def init_img_model(self):
        opt = self.opt
        self.img_model = build_unet(opt, "img")
        self.img_gaussian_diffusion = GaussianDiffusion(
            timesteps=opt.timesteps_img, beta_schedule="cosine",
            schedule_power=opt.schedule_power_img)
        self.rng, k = jax.random.split(self.rng)
        x = jnp.zeros((1, 64, 64, opt.in_channels_img), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        self.img_params = jax.jit(self.img_model.init)(k, x, t)

    def init_proj_model(self):
        opt = self.opt
        self.proj_model = build_unet(opt, "proj")
        self.proj_gaussian_diffusion = GaussianDiffusion(
            timesteps=opt.timesteps_proj, beta_schedule="cosine",
            schedule_power=opt.schedule_power_proj)
        self.rng, k = jax.random.split(self.rng)
        # init at a small shape that traverses every level (params are
        # spatial-size independent)
        depth = max(1, len(opt.channel_mult_proj) - 2)
        s = 2 ** (depth + 1)
        x = jnp.zeros((1, s, s, opt.in_channels_proj), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        self.proj_params = jax.jit(self.proj_model.init)(k, x, t)

    def init_convertor(self, convertor: str):
        from ipdm_tpu.recon.geometry import SIEMENS
        geom = (SIEMENS.replace(**self.opt.geometry)
                if self.opt.geometry else SIEMENS)
        self.convertor = Convertor(convertor, ntv=self.opt.ntv,
                                   nstart=self.opt.sart_nstart,
                                   nsubsets=self.opt.sart_subsets,
                                   geom=geom, exact_fbp=self.opt.exact_fbp,
                                   exact_art=self.opt.exact_art,
                                   sample_rate=self.opt.sart_sample_rate)

    def _init_training(self):
        opt = self.opt
        domain = self._train_domain
        if domain == "proj":
            params = self.proj_params
            gd = self.proj_gaussian_diffusion
            self.partial_timesteps = opt.partial_timesteps_proj
            self.train_resume_epochs = opt.resume_epochs_proj
        else:
            params = self.img_params
            gd = self.img_gaussian_diffusion
            self.partial_timesteps = opt.partial_timesteps_img
            self.train_resume_epochs = opt.resume_epochs_img
        # remat twin for training: identical params, jax.checkpoint per
        # block (activation memory O(depth) smaller in backprop)
        model = build_unet(opt, domain, remat=True)
        self.optimizer = make_optimizer(opt.init_lr)
        self.train_state = TrainState(params=params,
                                      opt_state=self.optimizer.init(params),
                                      step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            from ipdm_tpu.parallel import make_sharded_train_step
            self.train_step = make_sharded_train_step(
                model, gd, self.optimizer, self.partial_timesteps, self.mesh)
        else:
            self.train_step = make_train_step(model, gd, self.optimizer,
                                              self.partial_timesteps)

    # -- checkpoints (train_test_utils.py:247-251; loggerx.py:62-80) --------

    def _load_params(self, name, epoch, load_dir, model, target):
        """Load `save_models/{name}-{epoch}`: Orbax trees are directories;
        a plain *file* at that path is treated as a reference PyTorch
        state_dict (loggerx.py:62-69 layout) and imported via
        ipdm_tpu.utils.torch_import — reference-trained weights load
        directly."""
        import os.path as osp
        path = osp.join(load_dir or self.ckpt.dir, f"{name}-{epoch}")
        if osp.isfile(path):
            from ipdm_tpu.utils.torch_import import load_torch_checkpoint
            return load_torch_checkpoint(model, path)
        return self.ckpt.load(name, epoch, target=target, load_dir=load_dir)

    def load_model(self):
        opt = self.opt
        if (opt.resume_epochs_img > 0 and opt.load_img_model_path is not None
                and self.img_model is not None):
            t = self._load_params("img_model", opt.resume_epochs_img,
                                  opt.load_img_model_path,
                                  self.img_model, self.img_params)
            if t is not None:
                self.img_params = t
        if (opt.resume_epochs_proj > 0 and opt.load_proj_model_path is not None
                and self.proj_model is not None):
            t = self._load_params("proj_model", opt.resume_epochs_proj,
                                  opt.load_proj_model_path,
                                  self.proj_model, self.proj_params)
            if t is not None:
                self.proj_params = t
        # Resume: sync restored params into the train state and reload the
        # optimizer state + step, so Adam moments survive a restart (the
        # reference restores every registered module incl. 'optimizer' —
        # Utils/loggerx.py:71-80, registration train_test_utils.py:169-171).
        if self.train_state is not None and self.train_resume_epochs > 0:
            domain = self._train_domain
            params = (self.proj_params if domain == "proj"
                      else self.img_params)
            load_dir = (opt.load_proj_model_path if domain == "proj"
                        else opt.load_img_model_path)
            opt_state = self.ckpt.load("optimizer", self.train_resume_epochs,
                                       target=self.train_state.opt_state,
                                       load_dir=load_dir)
            step = jnp.asarray(self.train_resume_epochs * opt.save_freq
                               // opt.batch_size, jnp.int32)
            self.train_state = TrainState(
                params=params,
                opt_state=(opt_state if opt_state is not None
                           else self.train_state.opt_state),
                step=step)

    def checkpoints(self, epoch: int):
        if self._train_domain == "proj":
            self.proj_params = self.train_state.params
        elif self._train_domain == "img":
            self.img_params = self.train_state.params
        if self.proj_params is not None:
            self.ckpt.save("proj_model", epoch, self.proj_params)
        if self.img_params is not None:
            self.ckpt.save("img_model", epoch, self.img_params)
        if self.train_state is not None:
            self.ckpt.save("optimizer", epoch, self.train_state.opt_state)

    # -- model fns ----------------------------------------------------------
    # (apply_fn, params) pairs: the guided samplers jit with apply_fn static
    # and thread params through as traced arguments (see
    # guided._split_model_fn). The apply lambda is cached per MODEL (stable
    # across param updates), so retraining/reloading never retraces — and
    # params never bake into the executable as constants (closing over them
    # measured +~300 MB on the serialized flagship programs, which the
    # relay's executable fetch turns into warmup time; docs/PERF.md).

    def _shard_for_inference(self, x):
        """Shard the H (row) axis of an NHWC/NHW device array over EVERY
        mesh axis: one slice's UNet evals then spread across the whole mesh
        (per-slice latency scaling — the op-level recipe is
        parallel.mesh.make_spatial_sharded_apply; here the engine commits
        the input sharding and the samplers' existing jits compile SPMD)."""
        if self.mesh is None or x is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        # device_put requires the dim size divisible by the axis product:
        # use the largest suffix-accumulated subset of axes that divides H
        # (tiny test geometries: H=60 shards over data=4 but not 4x2)
        H = x.shape[1]
        axes = []
        prod = 1
        for name in self.mesh.axis_names:
            size = self.mesh.shape[name]
            if H % (prod * size) == 0:
                axes.append(name)
                prod *= size
        if not axes:
            return x
        spec = [None] * x.ndim
        spec[1] = tuple(axes)
        return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

    def _replicate(self, x):
        """Replicate a device value over the mesh (convertor inputs: the
        Pallas SART/FBP kernels run as unpartitioned custom calls)."""
        if self.mesh is None or x is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(x, NamedSharding(self.mesh, P()))

    def _proj_fn(self):
        return (ModelApply(self.proj_model), self.proj_params)

    def _img_fn(self):
        return (ModelApply(self.img_model), self.img_params)

    # -- data ---------------------------------------------------------------

    def init_data_loader(self):
        opt = self.opt
        self.train_loader = None
        if "train" in opt.mode:
            train_dataset = SiemensDatasetNpz(
                ldimg_path=opt.train_dataset_path_LD_img,
                fdimg_path=opt.train_dataset_path_FD_img,
                ldproj_path=opt.train_dataset_path_LD_proj,
                fdproj_path=opt.train_dataset_path_FD_proj,
                proj_clip=opt.clip_proj, img_clip=opt.clip_img,
                data_type=opt.data_type, patch=opt.patch,
                patch_per_image=opt.patch_per_image, seed=opt.seed)
            opt.max_iter = len(train_dataset) * opt.max_epochs // opt.batch_size
            opt.resume_iter = (self.train_resume_epochs * opt.save_freq
                               // opt.batch_size)
            # multi-host data parallelism: each host reads its interleaved
            # shard of the global stream (replaces the reference's dormant
            # torch.distributed rank sharding, Utils/sampler.py:10-16)
            sampler = RandomSampler(len(train_dataset),
                                    batch_size=opt.batch_size,
                                    num_iter=opt.max_iter,
                                    restore_iter=opt.resume_iter,
                                    seed=opt.seed,
                                    num_replicas=jax.process_count(),
                                    rank=jax.process_index())
            self.train_len = len(train_dataset)
            self.train_loader = DataLoader(train_dataset, opt.batch_size,
                                           sampler=sampler,
                                           collate=train_dataset.collate)
        test_dataset = SiemensDatasetNpz(
            ldimg_path=opt.test_dataset_path_LD_img,
            fdimg_path=opt.test_dataset_path_FD_img,
            ldproj_path=opt.test_dataset_path_LD_proj,
            fdproj_path=opt.test_dataset_path_FD_proj,
            proj_clip=opt.clip_proj, img_clip=opt.clip_img,
            data_type=opt.data_type, patch=None, patch_per_image=None)
        self.test_dataset = test_dataset
        self.test_loader = DataLoader(test_dataset, opt.test_batch_size)

    # -- temp clears (train_test_utils.py:397-419) --------------------------

    def temp_clear(self):
        self.proj_temp_clear()
        self.img_temp_clear()
        self.metric_clear()
        self.noise_strength = None

    def metric_clear(self):
        self.metric_instance = DotDict(LDCT=DotDict(), deProj=DotDict(),
                                       deImg=DotDict(), deProg=DotDict(),
                                       deProj2img=DotDict())

    def proj_temp_clear(self):
        self.proj_denoise_convert2img_result = ResultTempDict()
        self.proj_denoise_result = ResultTempDict()

    def img_temp_clear(self):
        self.img_denoise_result = ResultTempDict()
        self.progressive_denoise_result = ResultTempDict()

    # -- training (train_test_utils.py:253-272, 326-348) --------------------

    def train(self, inputs, n_iter: int, loss_temp):
        opt = self.opt
        images = inputs[1] if opt.mode == "train_proj" else inputs[2]
        images = flatten_patches(np.asarray(images, np.float32))
        if opt.normal:
            images, _ = yeo_johnson_transform(np.maximum(images, 0.0))
        self.rng, k = jax.random.split(self.rng)
        if self.mesh is not None:
            from ipdm_tpu.parallel import shard_batch
            images = shard_batch(images, self.mesh)
        self.train_state, loss = self.train_step(self.train_state, images, k)
        loss = float(loss)
        loss_temp[0] += loss
        self.logger.msg({"loss": loss, "lr": opt.init_lr}, n_iter)
        return loss

    def _native_train_iter(self):
        """C++ prefetching loader fast path (native/, SURVEY native #4 slot):
        decodes the training stream ahead of the device in worker threads.
        Returns an iterator yielding the 4-stream tuples train() expects, or
        None when unavailable/not applicable."""
        opt = self.opt
        from ipdm_tpu.utils import native
        if not (opt.native_loader and native.available()
                and not opt.normal):
            return None
        ds = self.train_loader.dataset
        files = (ds.fdproj_file_name if opt.mode == "train_proj"
                 else ds.fdimg_file_name)
        if files is None or any(f.endswith(".npz") for f in files[:1]):
            return None
        H, W = np.load(files[0], mmap_mode="r").shape[:2]
        indices = list(iter(self.train_loader.sampler))
        loader = native.NativeLoader(files, H, W, indices,
                                     batch=opt.batch_size, n_threads=2)
        stream_idx = 1 if opt.mode == "train_proj" else 2
        scale = 0.1 if (opt.mode == "train_proj" and opt.clip_proj) else 1.0
        rng = np.random.default_rng(opt.seed)

        def gen():
            for arr in loader:            # [b, H, W]
                arr = arr * scale
                if opt.patch:
                    ph, pw = opt.patch
                    ppi = opt.patch_per_image
                    out = np.empty((arr.shape[0], ppi, ph, pw, 1),
                                   np.float32)
                    for b in range(arr.shape[0]):
                        for k in range(ppi):
                            top = rng.integers(0, max(H - ph, 0) + 1)
                            left = rng.integers(0, max(W - pw, 0) + 1)
                            out[b, k, :, :, 0] = arr[b, top:top + ph,
                                                     left:left + pw]
                else:
                    out = arr[..., None]
                item = [None, None, None, None]
                item[stream_idx] = out
                yield tuple(item)

        return gen()

    def fit(self):
        opt = self.opt
        if "train" in opt.mode:
            loader = self._native_train_iter()
            if loader is None:
                loader = iter(self.train_loader)
            loss_temp = [0.0]
            for n_iter in range(opt.resume_iter + 1, opt.max_iter + 1):
                inputs = next(loader)
                self.train(inputs, n_iter, loss_temp)
                if n_iter % 10 == 0:
                    self.summer.add_scalar("train/loss", loss_temp[0] / 10,
                                           n_iter // 10)
                    loss_temp = [0.0]
                if n_iter % opt.save_freq == 0:
                    it = n_iter // opt.save_freq
                    self.checkpoints(it)
                    if opt.test_numbers > 0:
                        self.test(it)
        elif "test" in opt.mode:
            self.test(0)

    # -- evaluation (train_test_utils.py:274-324) ----------------------------

    def test(self, epoch: int):
        opt = self.opt
        if self._train_domain == "proj":
            self.proj_params = self.train_state.params
        elif self._train_domain == "img":
            self.img_params = self.train_state.params
        if opt.test_numbers <= 0:
            opt.test_numbers = len(self.test_dataset)
        np.random.seed(9527)  # the reference's fixed eval-sample seed
        random_test_id = np.sort(np.random.choice(
            len(self.test_dataset), opt.test_numbers, replace=False))
        self.metric_each_sample = []
        for idx in range(opt.test_numbers):
            tid = int(random_test_id[idx])
            ld_img, fd_proj, fd_img, ld_proj = self.test_dataset[tid]
            ld_img = None if ld_img is None else ld_img[None]
            fd_img = None if fd_img is None else fd_img[None]
            ld_proj = None if ld_proj is None else ld_proj[None]
            self.temp_clear()
            self.save_path_load(epoch, self.test_dataset.patient_name[tid],
                                self.test_dataset.slice_name[tid])
            self.data_sample_load(ldct=ld_img, ldproj=ld_proj,
                                  fdproj=fd_proj, fdct=fd_img)
            if opt.mode in ("train_proj", "test_proj"):
                self.proj_denoiser(self.ldproj)
                self.result_figure_save(mode="dproj2img", display=False,
                                        only_metric=not opt.display_result)
            if opt.mode in ("train_img", "test_img"):
                self.img_denoiser(self.ldct, mode="img_only")
                self.result_figure_save(mode="dimg", display=False,
                                        only_metric=not opt.display_result)
            if opt.mode == "test_prog":
                self.progressive_denoiser()
                self.result_figure_save(mode="progressive", display=False,
                                        only_metric=not opt.display_result)
            self.result_data_save(data_save=opt.test_result_data_save)
            self.metric_update()
        self.metric_total_save(epoch)
        if self.timer.totals:
            print("[phases]", self.timer.report())
        if "train" in opt.mode and self.summer is not None:
            for key in self.metric_total.keys():
                if self.metric_total[key]:
                    psnr_d = {k: v for k, v in self.metric_total[key].items()
                              if "psnr" in k}
                    self.summer.add_scalars(key + "/psnr", psnr_d, epoch)
                    ssim_d = {k: v for k, v in self.metric_total[key].items()
                              if "ssim" in k}
                    self.summer.add_scalars(key + "/ssim", ssim_d, epoch)

    # -- denoisers (train_test_utils.py:421-567) ----------------------------

    def proj_denoiser(self, x, convert=True, save_state=True,
                      save_proj_state=False, return_idx=-1):
        """x: device NHWC [B, na, nr, 1]. Returns (image NHWC or proj NHWC,
        noise_strength) like the reference (train_test_utils.py:421-480)."""
        opt = self.opt
        self.rng, k = jax.random.split(self.rng)
        if opt.sample_method_proj == "dense":
            result, _, noise_strength = guided_reverse_process(
                self._proj_fn(), self.proj_gaussian_diffusion, x, k,
                t_start=opt.t_start_proj, clip=opt.clip_proj,
                lambda_ratio=opt.lambda_ratio_proj, eta=opt.eta_proj,
                mode="proj", constant_guidance=opt.constant_guidance_proj,
                lambda_curve=self.proj_lambda_curve,
                kernel_size=opt.kernel_size_proj,
                amplitude=opt.amplitude_proj,
                only_convertor=opt.benchmark_test)
            self.noise_strength = noise_strength
        else:
            result = sparse_guided_reverse_process(
                self._proj_fn(), self.proj_gaussian_diffusion, x, k,
                t_start=opt.t_start_proj, condition_lambda_max=0.49,
                condition_lambda_min=0.35,
                ddim_timesteps=opt.ddim_timesteps_proj, eta=opt.eta_proj,
                clip_denoised=opt.clip_proj)
        if opt.normal and self.trans_ldproj is not None:
            result = [jnp.asarray(yeo_johnson_inverse_transform(
                np.asarray(r), self.trans_ldproj)) for r in result]
        self.proj_temp_clear()
        G = 10.0 if opt.clip_proj else 1.0  # un-scale (/10 load convention)
        if save_proj_state:
            for i, r in enumerate(result):
                self.proj_denoise_result[f"iter_{i + 1}"] = _to_nchw(r)
        if save_state:
            if convert:
                # one batched convert for all kept iterations (FBP/SART act
                # per-item, so stacking over the batch axis is exact and
                # amortizes the convertor's fixed cost ~K×)
                B = result[0].shape[0]
                stacked = self._replicate(
                    jnp.concatenate([G * r[..., 0] for r in result], axis=0))
                conv = self.convertor(stacked)[..., None]
                imgs = [conv[i * B:(i + 1) * B] for i in range(len(result))]
                for i, img in enumerate(imgs):
                    self.proj_denoise_convert2img_result[f"iter_{i + 1}"] = \
                        _to_nchw(img)
                return imgs[-1], self.noise_strength
            for i, r in enumerate(result):
                self.proj_denoise_result[f"iter_{i + 1}"] = _to_nchw(r)
            return result[return_idx], self.noise_strength
        if convert:
            img = self.convertor(self._replicate(
                G * result[return_idx][..., 0]))[..., None]
            self.proj_denoise_convert2img_result["iter_1"] = _to_nchw(img)
            return img, self.noise_strength
        self.proj_denoise_result["iter_1"] = _to_nchw(result[return_idx])
        return result[return_idx], self.noise_strength

    def img_denoiser(self, x, return_idx=-1, noise_strength=None,
                     mode="progressive", save_state=True):
        """x: device NHWC [B, H, W, 1] (train_test_utils.py:482-550)."""
        opt = self.opt
        self.rng, k = jax.random.split(self.rng)
        x = self._shard_for_inference(x)
        ldct = x
        if opt.sample_method_img == "dense":
            result, _, _ = guided_reverse_process(
                self._img_fn(), self.img_gaussian_diffusion, x, k,
                t_start=opt.t_start_img, clip=opt.clip_img,
                lambda_ratio=opt.lambda_ratio_img, eta=opt.eta_img,
                mode="img", constant_guidance=opt.constant_guidance_img,
                lambda_curve=self.img_lambda_curve,
                kernel_size=opt.kernel_size_img,
                amplitude=opt.amplitude_img,
                noise_strength=noise_strength, ldct=ldct,
                only_convertor=opt.benchmark_test,
                save_states=opt.save_states_img)
        else:
            result = sparse_guided_reverse_process(
                self._img_fn(), self.img_gaussian_diffusion, x, k,
                t_start=opt.t_start_img, condition_lambda_max=0.5,
                condition_lambda_min=0.3,
                ddim_timesteps=opt.ddim_timesteps_img, eta=opt.eta_img,
                clip_denoised=True)
        if opt.ultra_img_denoise:
            self.rng, k = jax.random.split(self.rng)
            result_, _, _ = guided_reverse_process(
                self._img_fn(), self.img_gaussian_diffusion, result[-1], k,
                t_start=[5, 5, 5], clip=opt.clip_img,
                lambda_ratio=opt.lambda_ratio_img, eta=0.6, mode="img",
                constant_guidance=0.6, lambda_curve=self.img_lambda_curve,
                kernel_size=opt.kernel_size_img, amplitude=opt.amplitude_img,
                noise_strength=noise_strength, ldct=ldct,
                only_convertor=opt.benchmark_test)
            result = result + result_
        if opt.normal and self.trans_ldimg is not None:
            result = [jnp.asarray(yeo_johnson_inverse_transform(
                np.asarray(r), self.trans_ldimg)) for r in result]
        self.img_temp_clear()
        store = (self.progressive_denoise_result if mode == "progressive"
                 else self.img_denoise_result)
        if save_state:
            for i, r in enumerate(result):
                store[f"iter_{i + 1}"] = _to_nchw(r)
        else:
            store["iter_1"] = _to_nchw(result[return_idx])
        return result[return_idx]

    def progressive_denoiser(self, save_proj_state=False, convert=True,
                             sharpen_num=42):
        """proj stage → (sharpen) → img stage (train_test_utils.py:552-567)."""
        opt = self.opt
        with self.timer.phase("proj_stage+convert") as ph:
            result, n_s = self.proj_denoiser(self.ldproj,
                                             save_state=opt.save_it_state_proj,
                                             save_proj_state=save_proj_state,
                                             convert=convert)
            ph["out"] = result
        if not (opt.convertor == "FBP" and opt.fbp_sharpen):
            sharpen_num = -1
        x = tensor_sharpen(result, sharpen_num)
        if opt.normal:
            x_np, trans = yeo_johnson_transform(np.asarray(x))
            self.trans_ldimg = trans
            x = jnp.asarray(x_np)
        with self.timer.phase("img_stage") as ph:
            result = self.img_denoiser(x, noise_strength=n_s,
                                       save_state=opt.save_it_state_img)
            ph["out"] = result
        return result

    # -- sample staging (train_test_utils.py:569-594) ------------------------

    def data_sample_load(self, ldct=None, ldproj=None, fdproj=None, fdct=None):
        """All inputs host NHWC numpy: ldct/fdct [1,512,512,1] μ maps,
        ldproj/fdproj [1,2000,912,1] sinograms."""
        opt = self.opt
        if ldct is not None:
            ldct = np.asarray(ldct, np.float32)
            if opt.normal:
                ldct_n, self.trans_ldimg = yeo_johnson_transform(ldct)
                self.ldct = self._shard_for_inference(jnp.asarray(ldct_n))
            else:
                self.ldct = self._shard_for_inference(jnp.asarray(ldct))
            self.ldct_np = miu2pixel(np.squeeze(ldct))
        if ldproj is not None:
            ldproj = np.asarray(ldproj, np.float32)
            if opt.normal:
                ldproj_n, self.trans_ldproj = yeo_johnson_transform(ldproj)
                self.ldproj = self._shard_for_inference(jnp.asarray(ldproj_n))
            else:
                self.ldproj = self._shard_for_inference(jnp.asarray(ldproj))
            self.ldproj_np = np.squeeze(ldproj)
        if fdct is not None:
            self.fdct = np.squeeze(miu2pixel(np.asarray(fdct, np.float32)))
        if fdproj is not None:
            self.fdproj = np.squeeze(np.asarray(fdproj, np.float32))

    # -- artifacts (train_test_utils.py:596-828) -----------------------------

    def save_path_load(self, epoch, patient_name, slice_name):
        self.save_path = osp.join(self.save_root_path, f"Save_Iter_{epoch}",
                                  str(patient_name), str(slice_name))
        os.makedirs(self.save_path, exist_ok=True)

    def result_figure_save(self, mode="progressive", display=True,
                           only_metric=False):
        """Metric computation + optional annotated PNG grids, with the
        reference's figure modes and fixed (-160,240) HU display window."""
        if mode not in ("progressive", "dimg", "dproj", "dproj2img"):
            print("ValueError: mode should be one of: \"progressive\","
                  "\"dimg\",\"dproj\",\"dproj2img\"")
            return -1
        plt = None
        if not only_metric or mode == "dproj":
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

        if mode == "dproj":
            delta_target = np.abs(self.fdproj - self.ldproj_np)
            n = len(self.proj_denoise_result)
            fig, ax = plt.subplots(1, 1 + n, figsize=(30, 30))
            vmin, vmax = delta_target.min(), delta_target.max()
            ax[0].set_title("res target", fontsize=35, y=1.02)
            ax[0].set_xticks([]), ax[0].set_yticks([])
            ax[0].imshow(delta_target, "inferno", vmin=vmin, vmax=vmax)
            for i in range(n):
                dp = np.abs(self.proj_denoise_result[f"iter_{i + 1}"][0, 0]
                            - self.fdproj)
                ax[i + 1].set_title(f"deProj iter{i + 1}", fontsize=35, y=1.02)
                ax[i + 1].set_xticks([]), ax[i + 1].set_yticks([])
                ax[i + 1].imshow(dp, "inferno", vmin=vmin, vmax=vmax)
            plt.savefig(self.save_path + "/dProj.png", dpi=100)
            if not display:
                plt.close(fig)
            return

        # the three image-grid modes share structure
        store, metric_mode, fname, title = {
            "dproj2img": (self.proj_denoise_convert2img_result, "deProj2img",
                          "deProj2img.png", "Proj"),
            "dimg": (self.img_denoise_result, "deImg", "deImg.png", "Img"),
            "progressive": (self.progressive_denoise_result, "deProg",
                            "progressive.png", "Img"),
        }[mode]

        self.metric_calculate(mode="LDCT", it=0, denoise_result=self.ldct_np)

        if mode == "progressive":
            for i in range(1, len(self.proj_denoise_convert2img_result) + 1):
                dr = miu2pixel(
                    self.proj_denoise_convert2img_result[f"iter_{i}"][0, 0])
                self.metric_calculate(mode="deProj", it=i, denoise_result=dr)
        img_its = len(store)
        results = {}
        for i in range(1, img_its + 1):
            dr = miu2pixel(store[f"iter_{i}"][0, 0])
            self.metric_calculate(mode=metric_mode, it=i, denoise_result=dr)
            results[i] = dr

        if only_metric:
            return
        w0, w1 = _WINDOW

        def show(a, img, ttl, s=None):
            a.set_title(ttl, fontsize=35, y=1.02)
            if s is not None:
                a.text(x=0.5, y=-0.12, s=s, fontsize=25,
                       horizontalalignment="center", transform=a.transAxes)
            a.set_xticks([]), a.set_yticks([])
            a.imshow(img, "gray", vmin=w0, vmax=w1)

        mi = self.metric_instance
        ld_s = "PSNR={:.2f} , SSIM={:.2f}".format(
            mi["LDCT"].get("psnr_iter_0", float("nan")),
            mi["LDCT"].get("ssim_iter_0", float("nan")))
        if mode == "progressive":
            ncols = 1 + max(img_its, len(self.proj_denoise_convert2img_result))
            fig, ax = plt.subplots(2, ncols, figsize=(7 * ncols, 16))
            show(ax[0, 0], self.ldct_np, "LDCT", ld_s)
            for i in range(1, len(self.proj_denoise_convert2img_result) + 1):
                dr = miu2pixel(
                    self.proj_denoise_convert2img_result[f"iter_{i}"][0, 0])
                s = "PSNR={:.2f} , SSIM={:.2f}".format(
                    mi["deProj"].get(f"psnr_iter_{i}", float("nan")),
                    mi["deProj"].get(f"ssim_iter_{i}", float("nan")))
                show(ax[0, i], dr, f"Proj iter{i}", s)
            for i in range(1, img_its + 1):
                r_it = img_its + 1 - i
                s = "PSNR={:.2f} , SSIM={:.2f}".format(
                    mi[metric_mode].get(f"psnr_iter_{r_it}", float("nan")),
                    mi[metric_mode].get(f"ssim_iter_{r_it}", float("nan")))
                show(ax[1, i], results[r_it], f"Img iter{r_it}", s)
            show(ax[1, 0], self.fdct, "FDCT")
        else:
            fig, ax = plt.subplots(1, 2 + img_its,
                                   figsize=(7 * (2 + img_its), 7))
            show(ax[0], self.ldct_np, "LDCT", ld_s)
            show(ax[1], self.fdct, "FDCT")
            for i in range(1, img_its + 1):
                r_it = img_its + 1 - i
                s = "PSNR={:.2f} , SSIM={:.2f}".format(
                    mi[metric_mode].get(f"psnr_iter_{r_it}", float("nan")),
                    mi[metric_mode].get(f"ssim_iter_{r_it}", float("nan")))
                show(ax[i + 1], results[r_it], f"{title} iter{r_it}", s)
        plt.savefig(osp.join(self.save_path, fname),
                    dpi=100 if mode == "progressive" else 200)
        if not display:
            plt.close(fig)

    def result_data_save(self, data_save=True):
        os.makedirs(self.save_path, exist_ok=True)
        if data_save:
            for ftype, fdata in zip(
                    ["prog_denoise_result", "proj_denoise_result",
                     "img_denoise_result", "proj_denoise_result_2img"],
                    [self.progressive_denoise_result,
                     self.proj_denoise_result, self.img_denoise_result,
                     self.proj_denoise_convert2img_result]):
                if len(fdata) > 0:
                    np.savez_compressed(
                        osp.join(self.save_path, f"{ftype}.npz"), **fdata)
        with open(osp.join(self.save_path, "metric.json"), "w") as f:
            f.write(json.dumps(self.metric_instance, sort_keys=False,
                               indent=4, separators=(",", ": ")))

    # -- metrics (train_test_utils.py:789-828) -------------------------------

    def metric_calculate(self, mode="LDCT", **kwargs):
        from ipdm_tpu.metrics import fsim, nqm, psnr, ssim, vif_p
        i = kwargs["it"]
        ld = np.asarray(kwargs["denoise_result"], np.float64)
        ld[np.isnan(ld)] = 0.5  # NaN guard (train_test_utils.py:792)
        fd = np.asarray(self.fdct, np.float64)
        mi = self.metric_instance[mode]
        if "psnr" in self.opt.metrics:
            mi[f"psnr_iter_{i}"] = float(psnr(fd, ld, data_range=1))
        if "ssim" in self.opt.metrics:
            mi[f"ssim_iter_{i}"] = float(ssim(fd, ld, win_size=11,
                                              data_range=1))
        if "fsim" in self.opt.metrics:
            mi[f"fsim_iter_{i}"] = float(fsim(fd, ld, data_range=1))
        if "vif" in self.opt.metrics:
            mi[f"vif_iter_{i}"] = float(vif_p(fd, ld, data_range=1))
        if "nqm" in self.opt.metrics:
            mi[f"nqm_iter_{i}"] = float(nqm(fd, ld))

    def metric_update(self):
        self.metric_each_sample.append(self.metric_instance)

    def metric_total_save(self, epoch):
        d = DotDict()
        metric_mean = DotDict()
        for m in self.metric_each_sample:
            dict_add(metric_mean, m, d)
        dict_mean(metric_mean, d)
        d = DotDict()
        for m in self.metric_each_sample:
            dict_value_minus_mean_square(m, metric_mean, d)
        dict_std(metric_mean, d)
        self.metric_total = metric_mean
        print(self.metric_total)
        out_dir = osp.join(self.save_root_path, f"Save_Iter_{epoch}")
        os.makedirs(out_dir, exist_ok=True)
        with open(osp.join(out_dir, "metric.json"), "w") as f:
            f.write(json.dumps(self.metric_total, sort_keys=False, indent=4,
                               separators=(",", ": ")))


# reference-compatible alias (main.py uses the snake_case name)
progressive_domain_denoiser = ProgressiveDomainDenoiser
