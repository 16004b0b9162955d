"""Load the REAL reference code from /root/reference as a test oracle.

The reference package assumes a CUDA box with timm installed and is laid
out as a script tree (`sys.path` hacks, `from data.dataset import ...`).
This helper builds just enough of that environment in-process to import
the actual source files unmodified:

- ``timm`` stub module (imported by networks/LiteSATRN.py:11 but unused
  by the ShallowCNN backbone path we exercise),
- ``data`` / ``data.dataset`` stub carrying the real token constants
  (values copied from /root/reference/data/dataset.py:12-15),
- the real ``postprocessing/decoding.py`` and
  ``postprocessing/postprocessing.py`` loaded by file path,
- the real ``networks/LiteSATRN.py`` and the three real schedulers.

CPU shim: the reference calls ``tensor.to(tensor.get_device())``
(networks/LiteSATRN.py:401,404) which only works on CUDA (CPU tensors
return device -1). ``cpu_get_device()`` patches ``torch.Tensor.get_device``
to return "cpu" so the identical math runs on CPU torch. This changes
no numerics — it only redirects a device move.
"""

import importlib.util
import pathlib
import sys
import types
from contextlib import contextmanager

REF = pathlib.Path("/root/reference")

_CACHE = {}


def _load_by_path(modname: str, path: pathlib.Path):
    spec = importlib.util.spec_from_file_location(modname, str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Import the real reference modules once; returns a namespace."""
    if "ns" in _CACHE:
        return _CACHE["ns"]

    if "timm" not in sys.modules:
        timm_stub = types.ModuleType("timm")
        # transformers probes importlib.util.find_spec("timm") at import
        # time, which raises ValueError on a stub whose __spec__ is None
        timm_stub.__spec__ = importlib.machinery.ModuleSpec("timm", None)

        def _no_network(*a, **k):
            raise RuntimeError("timm stub: no pretrained downloads in tests")

        timm_stub.create_model = _no_network
        sys.modules["timm"] = timm_stub

    # Constants from /root/reference/data/dataset.py:12-15.
    data_pkg = types.ModuleType("data")
    data_pkg.__path__ = []  # mark as package
    data_pkg.START, data_pkg.END, data_pkg.PAD = "<SOS>", "<EOS>", "<PAD>"
    data_pkg.SPECIAL_TOKENS = ["<SOS>", "<EOS>", "<PAD>"]
    data_ds = types.ModuleType("data.dataset")
    data_ds.START, data_ds.END, data_ds.PAD = "<SOS>", "<EOS>", "<PAD>"
    data_ds.SPECIAL_TOKENS = data_pkg.SPECIAL_TOKENS
    sys.modules["data"] = data_pkg
    sys.modules["data.dataset"] = data_ds

    pp_pkg = types.ModuleType("postprocessing")
    pp_pkg.__path__ = []
    sys.modules["postprocessing"] = pp_pkg

    decoding = _load_by_path(
        "postprocessing.decoding", REF / "postprocessing" / "decoding.py"
    )
    postprocessing = _load_by_path(
        "postprocessing.postprocessing", REF / "postprocessing" / "postprocessing.py"
    )
    lite_satrn = _load_by_path(
        "_ref_networks_lite_satrn", REF / "networks" / "LiteSATRN.py"
    )
    # Loads fine with the timm stub (timm.create_model is only called in
    # the EfficientNet encoder constructor, which the tests never build);
    # used for the REAL best-first beam_search (EfficientSATRN.py:708-867),
    # which only touches self.encoder/self.decoder — interface-compatible
    # with the real LiteSATRN instance the tests pass as ``self``.
    efficient_satrn = _load_by_path(
        "_ref_networks_efficient_satrn", REF / "networks" / "EfficientSATRN.py"
    )
    cosine = _load_by_path(
        "_ref_sched_cosine", REF / "schedulers" / "cosineannealing.py"
    )
    circular = _load_by_path(
        "_ref_sched_circular", REF / "schedulers" / "circular_lr.py"
    )
    tf_sched = _load_by_path(
        "_ref_sched_tf", REF / "schedulers" / "tf_scheduler.py"
    )

    ns = types.SimpleNamespace(
        decoding=decoding,
        postprocessing=postprocessing,
        lite_satrn=lite_satrn,
        efficient_satrn=efficient_satrn,
        cosine=cosine,
        circular=circular,
        tf_sched=tf_sched,
    )
    _CACHE["ns"] = ns
    return ns


def load_reference_full():
    """Additionally import the real ``utils`` package (ensemble_utils,
    metrics, data_utils, id_to_string) and the remaining real network
    files (EfficientASTER, SWIN).

    The reference's ``utils/__init__.py`` pulls in every network plus
    wandb/editdistance/psutil; the stubs below supply exactly the
    third-party surface the imports touch (wandb is never exercised by
    tests; editdistance.eval is backed by p4fr_tpu.native so the real
    metrics.py runs its own averaging/splitting logic unmodified).
    """
    if "full" in _CACHE:
        return _CACHE["full"]
    ns = load_reference()

    import torch
    from torch import nn

    timm_stub = sys.modules["timm"]
    if not hasattr(timm_stub, "models"):
        # SWIN.py:7 imports DropPath/to_2tuple/trunc_normal_ from
        # timm.models.layers; tests only construct the decoder halves,
        # so eval-mode-faithful minimal implementations suffice.
        class DropPath(nn.Module):
            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob or 0.0

            def forward(self, x):  # identity in eval mode
                return x

        layers = types.ModuleType("timm.models.layers")
        layers.DropPath = DropPath
        layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        models_mod = types.ModuleType("timm.models")
        models_mod.layers = layers
        timm_stub.models = models_mod
        sys.modules["timm.models"] = models_mod
        sys.modules["timm.models.layers"] = layers

    if "wandb" not in sys.modules:
        wandb_stub = types.ModuleType("wandb")

        def _no_wandb(*a, **k):
            raise RuntimeError("wandb stub: tests never log to wandb")

        wandb_stub.init = _no_wandb
        wandb_stub.log = _no_wandb
        wandb_stub.watch = _no_wandb
        wandb_stub.run = None
        sys.modules["wandb"] = wandb_stub

    if "editdistance" not in sys.modules:
        from p4fr_tpu.native import edit_distance

        ed_stub = types.ModuleType("editdistance")
        ed_stub.eval = edit_distance
        sys.modules["editdistance"] = ed_stub

    aster = _load_by_path(
        "_ref_networks_efficient_aster", REF / "networks" / "EfficientASTER.py"
    )
    swin = _load_by_path("_ref_networks_swin", REF / "networks" / "SWIN.py")

    # utils/utils.py:15 does `from networks import (...)`; expose the real
    # classes from the already-loaded real modules under that name.
    networks_pkg = types.ModuleType("networks")
    networks_pkg.__path__ = []
    for mod in (ns.efficient_satrn, ns.lite_satrn, aster, swin):
        for name in dir(mod):
            obj = getattr(mod, name)
            if isinstance(obj, type) and issubclass(obj, nn.Module):
                setattr(networks_pkg, name, obj)
    sys.modules["networks"] = networks_pkg

    spec = importlib.util.spec_from_file_location(
        "utils",
        str(REF / "utils" / "__init__.py"),
        submodule_search_locations=[str(REF / "utils")],
    )
    utils_pkg = importlib.util.module_from_spec(spec)
    sys.modules["utils"] = utils_pkg
    spec.loader.exec_module(utils_pkg)
    ensemble_utils = importlib.import_module("utils.ensemble_utils")

    full = types.SimpleNamespace(
        aster=aster,
        swin=swin,
        utils=utils_pkg,
        utils_utils=sys.modules["utils.utils"],
        metrics=sys.modules["utils.metrics"],
        data_utils=sys.modules["utils.data_utils"],
        ensemble_utils=ensemble_utils,
        **vars(ns),
    )
    _CACHE["full"] = full
    return full


def load_reference_trainer():
    """Additionally import the REAL ``train_modules/train_single_opt.py``
    (the training hot loop, :40-212) so tests can step the actual
    reference trainer code.

    Stubs exactly the import surface the module touches but never uses in
    ``_train_one_epoch``: torchvision.transforms (imported at :13, unused),
    the ``data`` package's loader/transform names (the tests drive the
    loop with their own loaders), and a ``schedulers`` package re-exporting
    the already-loaded real scheduler classes.
    """
    if "trainer" in _CACHE:
        return _CACHE["trainer"]
    full = load_reference_full()

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms

    data_pkg = sys.modules["data"]
    for name in ("get_train_transforms", "get_valid_transforms",
                 "dataset_loader"):
        if not hasattr(data_pkg, name):
            setattr(data_pkg, name, None)  # imported at :30, unused here

    if "schedulers" not in sys.modules:
        sched_pkg = types.ModuleType("schedulers")
        sched_pkg.__path__ = []
        sched_pkg.CircularLRBeta = full.circular.CircularLRBeta
        sched_pkg.CustomCosineAnnealingWarmUpRestarts = (
            full.cosine.CustomCosineAnnealingWarmUpRestarts
        )
        sched_pkg.TeacherForcingScheduler = (
            full.tf_sched.TeacherForcingScheduler
        )
        sys.modules["schedulers"] = sched_pkg

    trainer = _load_by_path(
        "_ref_train_single_opt", REF / "train_modules" / "train_single_opt.py"
    )
    out = types.SimpleNamespace(trainer=trainer, **vars(full))
    _CACHE["trainer"] = out
    return out


def load_reference_trainer_dual():
    """Additionally import the REAL ``train_modules/train_dual_opt.py``
    (two optimizers, per-group clipping at :101-106, transformers'
    constant-schedule-with-warmup decoder schedule at :357-359).
    transformers is installed, so the real schedule function is used."""
    if "trainer_dual" in _CACHE:
        return _CACHE["trainer_dual"]
    base = load_reference_trainer()  # sets up data/schedulers/wandb stubs
    dual = _load_by_path(
        "_ref_train_dual_opt", REF / "train_modules" / "train_dual_opt.py"
    )
    out = types.SimpleNamespace(trainer_dual=dual, **vars(base))
    _CACHE["trainer_dual"] = out
    return out


def load_reference_trainer_distill():
    """Additionally import the REAL ``train_modules/train_distillation.py``
    (teacher un-TF'd no_grad forward + loss_fn_kd, :49-55,107-128).
    psutil/torchvision are available/stubbed; the ``data`` package stub
    grows the ``get_distillation_dataloaders`` name the import touches."""
    if "trainer_distill" in _CACHE:
        return _CACHE["trainer_distill"]
    base = load_reference_trainer()
    data_pkg = sys.modules["data"]
    if not hasattr(data_pkg, "get_distillation_dataloaders"):
        data_pkg.get_distillation_dataloaders = None  # imported, unused
    distill = _load_by_path(
        "_ref_train_distillation",
        REF / "train_modules" / "train_distillation.py",
    )
    out = types.SimpleNamespace(trainer_distill=distill, **vars(base))
    _CACHE["trainer_distill"] = out
    return out


@contextmanager
def cpu_get_device():
    """Run reference CUDA-assuming code on CPU torch (see module docstring)."""
    import torch

    orig = torch.Tensor.get_device
    torch.Tensor.get_device = lambda self: "cpu"
    try:
        yield
    finally:
        torch.Tensor.get_device = orig


def make_flags(*, height, width, enc_hidden, enc_filter, enc_heads,
               enc_layers, dec_src, dec_hidden, dec_filter, dec_heads,
               dec_layers, dropout=0.1, rgb=3):
    """FLAGS namespace matching networks/LiteSATRN.py:549-573 access paths."""
    sn = types.SimpleNamespace
    return sn(
        input_size=sn(height=height, width=width),
        data=sn(rgb=rgb),
        dropout_rate=dropout,
        SATRN=sn(
            encoder=sn(hidden_dim=enc_hidden, filter_dim=enc_filter,
                       head_num=enc_heads, layer_num=enc_layers),
            decoder=sn(src_dim=dec_src, hidden_dim=dec_hidden,
                       filter_dim=dec_filter, head_num=dec_heads,
                       layer_num=dec_layers),
        ),
    )


def make_dataset_stub(vocab):
    """train_dataset stand-in: LiteSATRN only reads the two vocab maps."""
    return types.SimpleNamespace(
        id_to_token=dict(vocab.id_to_token),
        token_to_id=dict(vocab.token_to_id),
    )
