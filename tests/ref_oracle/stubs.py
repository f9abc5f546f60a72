"""Shims that make the reference's own code importable/runnable on this host.

The reference (`/root/reference`) is the parity oracle: its eval pipelines are
executed directly (not re-implemented) and compared against mal_tpu. This
environment lacks `torchvision`, `skimage`, and CUDA, so we install:

- a faithful standard torchvision-resnet stub (`torchvision.models.resnet`,
  public textbook architecture: the reference only needs the module structure
  and state-dict layout; weights are random + converted, so init distributions
  are irrelevant),
- a minimal `torchvision.transforms` (ToTensor / Resize / ColorJitter — the
  eval path only uses ToTensor and PIL Resize),
- a `skimage.transform.resize` stub (order-0 nearest; only touched by
  velodyne-GT loading, which the synthetic trees do not exercise),
- `PIL.Image.ANTIALIAS` (removed in Pillow>=10; the reference pins it at
  `manydepth/datasets/mono_dataset.py:56`) aliased to LANCZOS,
- `.cuda()` no-ops on CPU-only torch (`manydepth/evaluate_depth.py:99` calls
  `.cuda()` unconditionally).

Nothing here touches `/root/reference` on disk.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# torchvision.models.resnet — standard architecture
# ---------------------------------------------------------------------------

def _build_torchvision_stub():
    import torch
    import torch.nn as nn

    def conv3x3(inp, out, stride=1):
        return nn.Conv2d(inp, out, kernel_size=3, stride=stride, padding=1,
                         bias=False)

    def conv1x1(inp, out, stride=1):
        return nn.Conv2d(inp, out, kernel_size=1, stride=stride, bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = conv1x1(inplanes, planes)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = conv3x3(planes, planes, stride)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = conv1x1(planes, planes * self.expansion)
            self.bn3 = nn.BatchNorm2d(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000, **kwargs):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, kernel_size=7, stride=2, padding=3,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
            self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
            self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)
            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                            nonlinearity="relu")
                elif isinstance(m, nn.BatchNorm2d):
                    nn.init.constant_(m.weight, 1)
                    nn.init.constant_(m.bias, 0)

        def _make_layer(self, block, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    conv1x1(self.inplanes, planes * block.expansion, stride),
                    nn.BatchNorm2d(planes * block.expansion))
            layers = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    def _factory(block, layers):
        def make(pretrained=False, **kwargs):
            assert not pretrained, "stub torchvision has no pretrained weights"
            return ResNet(block, layers, **kwargs)
        return make

    resnet_mod = types.ModuleType("torchvision.models.resnet")
    resnet_mod.BasicBlock = BasicBlock
    resnet_mod.Bottleneck = Bottleneck
    resnet_mod.ResNet = ResNet
    resnet_mod.conv3x3 = conv3x3
    resnet_mod.conv1x1 = conv1x1
    resnet_mod.model_urls = {f"resnet{n}": f"stub://resnet{n}"
                             for n in (18, 34, 50, 101, 152)}
    resnet_mod.resnet18 = _factory(BasicBlock, [2, 2, 2, 2])
    resnet_mod.resnet34 = _factory(BasicBlock, [3, 4, 6, 3])
    resnet_mod.resnet50 = _factory(Bottleneck, [3, 4, 6, 3])
    resnet_mod.resnet101 = _factory(Bottleneck, [3, 4, 23, 3])
    resnet_mod.resnet152 = _factory(Bottleneck, [3, 8, 36, 3])

    models_mod = types.ModuleType("torchvision.models")
    models_mod.resnet = resnet_mod
    for name in ("ResNet", "resnet18", "resnet34", "resnet50", "resnet101",
                 "resnet152"):
        setattr(models_mod, name, getattr(resnet_mod, name))

    # -- transforms ---------------------------------------------------------
    from PIL import Image, ImageEnhance

    class ToTensor:
        def __call__(self, pic):
            if isinstance(pic, torch.Tensor):
                return pic
            arr = np.array(pic, copy=True)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1)).contiguous()
            if arr.dtype == np.uint8:  # torchvision scales only byte images
                return t.float().div(255)
            return t.float()

    class Resize:
        def __init__(self, size, interpolation=Image.BILINEAR, **kwargs):
            self.size = tuple(size)  # (h, w)
            self.interpolation = interpolation

        def __call__(self, img):
            h, w = self.size
            if isinstance(img, Image.Image):
                return img.resize((w, h), self.interpolation)
            t = img if img.dim() == 4 else img[None]
            out = torch.nn.functional.interpolate(
                t, size=(h, w), mode="bilinear", align_corners=False)
            return out if img.dim() == 4 else out[0]

    class ColorJitter:
        """Enough of torchvision's ColorJitter for MonoDataset: tuple ranges
        + get_params; eval paths never call it (do_color_aug=False)."""

        def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
            self.brightness = self._range(brightness, 1.0)
            self.contrast = self._range(contrast, 1.0)
            self.saturation = self._range(saturation, 1.0)
            self.hue = self._range(hue, 0.0)

        @staticmethod
        def _range(v, center):
            if isinstance(v, (tuple, list)):
                return tuple(v)
            return (max(0.0, center - v), center + v)

        @staticmethod
        def get_params(brightness, contrast, saturation, hue):
            if not all(isinstance(v, (tuple, list))
                       for v in (brightness, contrast, saturation, hue)):
                raise TypeError("tuple ranges required")
            import random as _random
            fb = _random.uniform(*brightness)
            fc = _random.uniform(*contrast)
            fs = _random.uniform(*saturation)
            fh = _random.uniform(*hue)

            def apply(img):
                img = ImageEnhance.Brightness(img).enhance(fb)
                img = ImageEnhance.Contrast(img).enhance(fc)
                img = ImageEnhance.Color(img).enhance(fs)
                if abs(fh) > 1e-6:
                    hch, s, v = img.convert("HSV").split()
                    hch = hch.point(lambda x: (x + int(fh * 255)) % 256)
                    img = Image.merge("HSV", (hch, s, v)).convert("RGB")
                return img
            return apply

        def __call__(self, img):
            return self.get_params(self.brightness, self.contrast,
                                   self.saturation, self.hue)(img)

    transforms_mod = types.ModuleType("torchvision.transforms")
    transforms_mod.ToTensor = ToTensor
    transforms_mod.Resize = Resize
    transforms_mod.ColorJitter = ColorJitter

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.0.stub"
    tv.models = models_mod
    tv.transforms = transforms_mod
    tv._is_tracing = lambda: False  # mask2former/utils/misc.py:51
    return {"torchvision": tv,
            "torchvision.models": models_mod,
            "torchvision.models.resnet": resnet_mod,
            "torchvision.transforms": transforms_mod}


def _build_yacs_stub():
    class CfgNode(dict):
        """Attribute-access dict (the slice of yacs the reference uses:
        `dualrefine/networks/hrnet_config.py` builds static nested configs
        read back via attribute and item access)."""

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError as e:
                raise AttributeError(name) from e

        def __setattr__(self, name, value):
            self[name] = value

        def clone(self):
            import copy
            return copy.deepcopy(self)

        def freeze(self):
            return self

        def defrost(self):
            return self

    config_mod = types.ModuleType("yacs.config")
    config_mod.CfgNode = CfgNode
    yacs_mod = types.ModuleType("yacs")
    yacs_mod.config = config_mod
    return {"yacs": yacs_mod, "yacs.config": config_mod}


def _build_wandb_stub():
    wandb = types.ModuleType("wandb")
    wandb.run = None
    wandb.init = lambda *a, **k: None
    wandb.log = lambda *a, **k: None
    wandb.finish = lambda *a, **k: None
    wandb.config = {}
    return {"wandb": wandb}


def _build_detectron2_stub():
    """Import-surface stub: `dynamicdepth/trainer.py:33-37` imports five
    detectron2 symbols at module level but the eval_mode path never calls
    them (`setup_cfg` additionally references the commented-out
    `add_maskformer2_config` — SURVEY.md §1 known defects)."""
    def _unavailable(*a, **k):
        raise RuntimeError("detectron2 stub: not available in this env")

    config_mod = types.ModuleType("detectron2.config")
    config_mod.get_cfg = _unavailable
    config_mod.CfgNode = dict
    deeplab_mod = types.ModuleType("detectron2.projects.deeplab")
    deeplab_mod.add_deeplab_config = _unavailable
    projects_mod = types.ModuleType("detectron2.projects")
    projects_mod.deeplab = deeplab_mod
    modeling_mod = types.ModuleType("detectron2.modeling")
    modeling_mod.build_model = _unavailable
    checkpoint_mod = types.ModuleType("detectron2.checkpoint")
    checkpoint_mod.DetectionCheckpointer = _unavailable
    d2 = types.ModuleType("detectron2")
    d2.config = config_mod
    d2.projects = projects_mod
    d2.modeling = modeling_mod
    d2.checkpoint = checkpoint_mod
    return {"detectron2": d2, "detectron2.config": config_mod,
            "detectron2.projects": projects_mod,
            "detectron2.projects.deeplab": deeplab_mod,
            "detectron2.modeling": modeling_mod,
            "detectron2.checkpoint": checkpoint_mod}


def _build_torch_sparse_stub():
    """`torch_sparse.coalesce` with op='max' — the one entry point the
    reference uses (`dynamicdepth/rigid_warp.py:7,571-599`): dedupe sparse
    (row, col) indices, reducing duplicate values by max."""
    import torch

    def coalesce(index, value, m, n, op="add"):
        row, col = index[0].long(), index[1].long()
        lin = row * n + col
        uniq, inv = torch.unique(lin, return_inverse=True)
        out = torch.zeros(uniq.numel(), *value.shape[1:], dtype=value.dtype,
                          device=value.device)
        if op == "max":
            out = out.scatter_reduce(
                0, inv[:, None].expand_as(value) if value.dim() > 1 else inv,
                value, reduce="amax", include_self=False)
        elif op == "add":
            out = out.index_add(0, inv, value)
        elif op == "mean":
            out = out.index_add(0, inv, value)
            cnt = torch.zeros(uniq.numel(), dtype=value.dtype,
                              device=value.device).index_add(
                0, inv, torch.ones_like(inv, dtype=value.dtype))
            out = out / cnt.clamp(min=1).reshape(
                -1, *([1] * (value.dim() - 1)))
        else:
            raise NotImplementedError(op)
        new_index = torch.stack([uniq // n, uniq % n], 0)
        return new_index, out

    ts = types.ModuleType("torch_sparse")
    ts.coalesce = coalesce
    return {"torch_sparse": ts}


def _build_torchmetrics_stub():
    """Minimal torchmetrics.Metric: single-process semantics of the slice
    `manydepth/trainer.py:75-103` (DepthBins) uses — add_state sets the
    attribute, update/compute are subclass-defined, no dist reduction."""
    import torch

    class Metric(torch.nn.Module):
        full_state_update = False

        def __init__(self, **kwargs):
            super().__init__()

        def add_state(self, name, default=None, dist_reduce_fx=None):
            setattr(self, name, default)

        def forward(self, *a, **k):
            return self.update(*a, **k)

    tm = types.ModuleType("torchmetrics")
    tm.Metric = Metric
    return {"torchmetrics": tm}


def _build_manydepth_missing_modules():
    """The reference imports two manydepth modules missing from its snapshot
    (SURVEY.md §1): `manydepth.vis` (colorize) and `manydepth.pareto`
    (pareto_fn, used only behind --pareto)."""
    vis = types.ModuleType("manydepth.vis")

    def colorize(value, vmin=None, vmax=None, cmap="plasma"):
        arr = np.asarray(value, np.float32)
        lo = float(arr.min()) if vmin is None else vmin
        hi = float(arr.max()) if vmax is None else vmax
        norm = np.clip((arr - lo) / max(hi - lo, 1e-8), 0, 1)
        return (np.stack([norm] * 3, -1) * 255).astype(np.uint8)

    vis.colorize = colorize

    pareto = types.ModuleType("manydepth.pareto")

    def pareto_fn(*a, **k):
        raise NotImplementedError(
            "manydepth.pareto is missing from the reference snapshot")

    pareto.pareto_fn = pareto_fn
    return {"manydepth.vis": vis, "manydepth.pareto": pareto}


def _build_mask2former_pkg_stub():
    """`manydepth/trainer.py:57` imports add_maskformer2_config from the
    mask2former package, whose __init__ needs full detectron2; the non-
    temporal paths never call it, so shadow with a config no-op."""
    m2f = types.ModuleType("mask2former")
    m2f.add_maskformer2_config = lambda cfg: cfg
    return {"mask2former": m2f}


def _build_point_rend_stub():
    """Functional `detectron2.projects.point_rend.point_features` — the two
    public functions the reference training criterion/matcher import
    (`mask2former/modeling/criterion.py:13-16`, `matcher.py:12`), written to
    detectron2's documented semantics: point_sample = grid_sample on
    [0,1]->[-1,1] coords (align_corners=False), and PointRend's
    oversample -> top-k-uncertainty -> append-random coord selection."""
    import torch
    import torch.nn.functional as F

    def point_sample(input, point_coords, **kwargs):
        add_dim = False
        if point_coords.dim() == 3:
            add_dim = True
            point_coords = point_coords.unsqueeze(2)
        output = F.grid_sample(input, 2.0 * point_coords - 1.0, **kwargs)
        if add_dim:
            output = output.squeeze(3)
        return output

    def get_uncertain_point_coords_with_randomness(
            coarse_logits, uncertainty_func, num_points, oversample_ratio,
            importance_sample_ratio):
        assert oversample_ratio >= 1
        assert 0 <= importance_sample_ratio <= 1
        num_boxes = coarse_logits.shape[0]
        num_sampled = int(num_points * oversample_ratio)
        point_coords = torch.rand(num_boxes, num_sampled, 2,
                                  device=coarse_logits.device)
        point_logits = point_sample(coarse_logits, point_coords,
                                    align_corners=False)
        point_uncertainties = uncertainty_func(point_logits)
        num_uncertain_points = int(importance_sample_ratio * num_points)
        num_random_points = num_points - num_uncertain_points
        idx = torch.topk(point_uncertainties[:, 0, :],
                         k=num_uncertain_points, dim=1)[1]
        shift = num_sampled * torch.arange(num_boxes, dtype=torch.long,
                                           device=coarse_logits.device)
        idx += shift[:, None]
        point_coords = point_coords.view(-1, 2)[idx.view(-1), :].view(
            num_boxes, num_uncertain_points, 2)
        if num_random_points > 0:
            point_coords = torch.cat(
                [point_coords,
                 torch.rand(num_boxes, num_random_points, 2,
                            device=coarse_logits.device)], dim=1)
        return point_coords

    pf = types.ModuleType("detectron2.projects.point_rend.point_features")
    pf.point_sample = point_sample
    pf.get_uncertain_point_coords_with_randomness = (
        get_uncertain_point_coords_with_randomness)
    pr = types.ModuleType("detectron2.projects.point_rend")
    pr.point_features = pf

    comm = types.ModuleType("detectron2.utils.comm")
    comm.get_world_size = lambda: 1
    utils_mod = types.ModuleType("detectron2.utils")
    utils_mod.comm = comm
    return {"detectron2.projects.point_rend": pr,
            "detectron2.projects.point_rend.point_features": pf,
            "detectron2.utils": utils_mod,
            "detectron2.utils.comm": comm}


def expose_reference_mask2former_modeling():
    """Graft the REAL `mask2former.modeling.{criterion,matcher}` (and the
    `mask2former.utils.misc` they import) onto the shadowing package stub.

    `install_reference_shims` replaces `mask2former` with a no-op module
    because its real `__init__` pulls full detectron2; the training-only
    criterion/matcher modules themselves import cleanly under the
    point_rend stub, so give the stub package a `__path__` into
    `/root/reference` plus synthetic `modeling`/`utils` subpackages whose
    `__init__`s are never executed."""
    import importlib
    import importlib.machinery

    install_reference_shims()
    root = os.path.join(REFERENCE_ROOT, "mask2former")
    m2f = sys.modules["mask2former"]
    m2f.__path__ = [root]
    for sub in ("modeling", "utils"):
        name = f"mask2former.{sub}"
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [os.path.join(root, sub)]
            pkg.__spec__ = importlib.machinery.ModuleSpec(
                name, None, is_package=True)
            sys.modules[name] = pkg
    criterion = importlib.import_module("mask2former.modeling.criterion")
    matcher = importlib.import_module("mask2former.modeling.matcher")
    return criterion, matcher


def _build_detectron2_structures_stub():
    """Functional detectron2 Instances (fields + image_size + indexing) —
    the container `manydepth/matcher.py`/`dyn_utils.py` pass around."""

    class Instances:
        def __init__(self, image_size, **fields):
            self._image_size = tuple(image_size)
            self._fields = {}
            for k, v in fields.items():
                self.set(k, v)

        @property
        def image_size(self):
            return self._image_size

        def set(self, name, value):
            self._fields[name] = value

        def has(self, name):
            return name in self._fields

        def get(self, name):
            return self._fields[name]

        def __setattr__(self, name, value):
            if name.startswith("_"):
                super().__setattr__(name, value)
            else:
                self.set(name, value)

        def __getattr__(self, name):
            if name.startswith("_") or name not in self._fields:
                raise AttributeError(name)
            return self._fields[name]

        def __len__(self):
            for v in self._fields.values():
                return len(v)
            return 0

        def __getitem__(self, item):
            out = Instances(self._image_size)
            for k, v in self._fields.items():
                out.set(k, v[item])
            return out

        def to(self, *a, **k):
            out = Instances(self._image_size)
            for key, v in self._fields.items():
                out.set(key, v.to(*a, **k) if hasattr(v, "to") else v)
            return out

    structures_mod = types.ModuleType("detectron2.structures")
    structures_mod.Instances = Instances
    instances_mod = types.ModuleType("detectron2.structures.instances")
    instances_mod.Instances = Instances
    structures_mod.instances = instances_mod
    return {"detectron2.structures": structures_mod,
            "detectron2.structures.instances": instances_mod}


def _build_skimage_stub():
    def resize(image, output_shape, order=1, preserve_range=False,
               mode="constant", anti_aliasing=None):
        image = np.asarray(image)
        h, w = int(output_shape[0]), int(output_shape[1])
        ys = np.clip(np.round((np.arange(h) + 0.5) * image.shape[0] / h - 0.5),
                     0, image.shape[0] - 1).astype(np.int64)
        xs = np.clip(np.round((np.arange(w) + 0.5) * image.shape[1] / w - 0.5),
                     0, image.shape[1] - 1).astype(np.int64)
        out = image[ys][:, xs]
        return out if preserve_range else out.astype(np.float64)

    transform_mod = types.ModuleType("skimage.transform")
    transform_mod.resize = resize
    sk = types.ModuleType("skimage")
    sk.transform = transform_mod
    return {"skimage": sk, "skimage.transform": transform_mod}


_installed = False


def install_reference_shims():
    """Idempotently install stubs + path so `/root/reference` packages import."""
    global _installed
    if _installed:
        return
    import torch
    import torch.nn as nn

    import importlib.machinery

    from tests.ref_oracle.deq_lib import build_lib_modules

    for name, mod in {**_build_torchvision_stub(),
                      **_build_skimage_stub(),
                      **_build_yacs_stub(),
                      **_build_wandb_stub(),
                      **_build_detectron2_stub(),
                      **_build_point_rend_stub(),
                      **_build_detectron2_structures_stub(),
                      **_build_torch_sparse_stub(),
                      **_build_torchmetrics_stub(),
                      **_build_manydepth_missing_modules(),
                      **_build_mask2former_pkg_stub(),
                      **build_lib_modules("dualrefine.networks")}.items():
        # a real __spec__ so importlib.util.find_spec probes (e.g.
        # accelerate's wandb availability check) don't raise
        if getattr(mod, "__spec__", None) is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules.setdefault(name, mod)

    from PIL import Image
    if not hasattr(Image, "ANTIALIAS"):
        Image.ANTIALIAS = Image.LANCZOS

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        nn.Module.cuda = lambda self, *a, **k: self

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _installed = True
