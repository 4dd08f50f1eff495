"""End-to-end behavioral A/B harness vs the ACTUAL reference implementation.

Drives the reference's own training loop — ``train_epoch`` / ``valid`` from
/root/reference/main.py (imported, not reimplemented) with the reference's
own models/optimizer/GSPlugin/History — and this framework's jitted steps on
IDENTICAL data (the same captured batch stream) from IDENTICAL init (the
torch model's state_dict imported through models/torch_import.py), then
compares per-epoch loss / accuracy trajectories.

This is the trajectory-level accuracy-parity proof for the four regimes
(Normal, OGM/OGM_GE, QMF, MLA±dynamic) available without the real datasets
(reference: main.py:127-679).

CPU shims: the reference is CUDA-only research code — ``.cuda()`` calls are
made identity, and the heavy third-party deps its unused import paths pull in
(torchvision/torchaudio/timm) are stubbed. The AVClassifier path under test
touches none of the stubs.

NOTE on ghost updates: the reference's behavior depends on the torch version
it runs under. Under torch>=2.0 ``optimizer.zero_grad`` sets grads to None,
so MLA sub-steps never apply momentum/weight-decay-only updates to encoders
stepped earlier in the batch. This image has torch 2.x, so the A/B runs our
``ghost_updates=False`` mode; the default True reproduces the torch-1.8.1
semantics of the paper's published environment.
"""

from __future__ import annotations

import argparse
import contextlib
import importlib.machinery
import importlib.util
import sys
import types
from typing import Dict, List

import numpy as np

REF_ROOT = "/root/reference"

_REF = None


def _stub_module(name: str) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    # transformers probes importlib.util.find_spec("timm"); a spec-less
    # sys.modules entry makes that raise instead of returning the stub
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = m
    return m


def load_reference():
    """Import /root/reference/main.py with CPU shims + absent-dep stubs."""
    global _REF
    if _REF is not None:
        return _REF
    import torch
    import torch.nn as nn

    # CUDA-written research code on a CPU-only torch build
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    # m3ae.py hardcodes .to(torch.device('cuda:0')) inside its forward
    # (m3ae.py:61,115,343-361) — coerce cuda targets to cpu
    _tensor_to = torch.Tensor.to

    def _to_cpu(self, *a, **k):
        a = tuple(torch.device("cpu")
                  if isinstance(d, torch.device) and d.type == "cuda" else d
                  for d in a)
        d = k.get("device")
        if isinstance(d, torch.device) and d.type == "cuda":
            k["device"] = torch.device("cpu")
        return _tensor_to(self, *a, **k)

    torch.Tensor.to = _to_cpu
    # oneDNN picks Winograd-style 3x3 conv backwards whose fp32 numerics sit
    # ~1e-3 relative off the direct algorithm (measured: visual_net grad
    # errors collapse from 1e-1 to 1e-6 relative with it off). The A/B
    # compares algorithmic trajectories, so run torch on the direct path.
    torch.backends.mkldnn.enabled = False

    tv = _stub_module("torchvision")
    tr = _stub_module("torchvision.transforms")
    tv.transforms = tr
    for cls in ("Compose", "RandomResizedCrop", "RandomHorizontalFlip",
                "ToTensor", "Normalize", "Resize", "CenterCrop"):
        setattr(tr, cls, type(cls, (), {"__init__": lambda self, *a, **k: None}))
    _stub_module("torchaudio")
    timm = _stub_module("timm")
    timm.__version__ = "0.4.5"
    td = _stub_module("timm.data")
    td.create_transform = lambda *a, **k: None
    timm.data = td
    tmodels = _stub_module("timm.models")
    tlayers = _stub_module("timm.models.layers")
    tlayers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
    tlayers.trunc_normal_ = lambda *a, **k: None

    class _DropPath(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    tlayers.DropPath = _DropPath
    tvit = _stub_module("timm.models.vision_transformer")

    # cav_mae.py's Block composes timm's Attention/Mlp (cav_mae.py:93,101)
    # while replacing timm's PatchEmbed/Block with its own (cav_mae.py:120-124)
    # — so those two stubs must be REAL timm-0.4.5 math, the rest shells.
    class _Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, qk_scale=None,
                     attn_drop=0., proj_drop=0.):
            super().__init__()
            self.num_heads = num_heads
            self.scale = qk_scale or (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            B, N, C = x.shape
            qkv = (self.qkv(x)
                   .reshape(B, N, 3, self.num_heads, C // self.num_heads)
                   .permute(2, 0, 3, 1, 4))
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(dim=-1)
            x = (self.attn_drop(attn) @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj_drop(self.proj(x))

    class _Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.):
            super().__init__()
            self.fc1 = nn.Linear(in_features, hidden_features or in_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features or in_features,
                                 out_features or in_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    tvit.Attention = _Attention
    tvit.Mlp = _Mlp
    for cls in ("PatchEmbed", "Block"):
        setattr(tvit, cls, type(cls, (nn.Module,), {
            "__init__": lambda self, *a, **k: nn.Module.__init__(self)}))
    tmodels.layers = tlayers
    tmodels.vision_transformer = tvit
    timm.models = tmodels

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    spec = importlib.util.spec_from_file_location("ref_main",
                                                  REF_ROOT + "/main.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _REF = mod
    return mod


def ref_namespace(cfg, av_alpha: float) -> argparse.Namespace:
    """The argparse namespace the reference threads everywhere
    (main.py:18-63), populated from our config."""
    return argparse.Namespace(
        dataset=cfg.dataset, modulation=cfg.modulation,
        fusion_method=cfg.fusion_method, lorb=cfg.lorb, clip=cfg.clip,
        modal3=cfg.modal3, gs_flag=cfg.gs_flag, dynamic=cfg.dynamic,
        alpha=cfg.alpha, modulation_starts=cfg.modulation_starts,
        modulation_ends=cfg.modulation_ends, av_alpha=av_alpha,
        a_alpha=cfg.a_alpha, v_alpha=cfg.v_alpha, t_alpha=cfg.t_alpha,
        use_video_frames=cfg.use_video_frames, batch_size=cfg.batch_size,
        use_tensorboard=False,
        learning_rate=cfg.learning_rate, lr_decay_step=cfg.lr_decay_step,
        lr_decay_ratio=cfg.lr_decay_ratio, random_seed=cfg.random_seed,
        mask_percent=cfg.mask_percent, mask_m=cfg.mask_m)


# ---------------------------------------------------------------------------
# identical data for both sides
# ---------------------------------------------------------------------------

def capture_batches(cfg, epochs: int):
    """Run our deterministic input pipeline once, capture the host batch
    streams both sides will consume (train per epoch; eval once)."""
    from mla_tpu.data.datasets import build_adapter
    from mla_tpu.data.pipeline import Loader

    train_adapter = build_adapter(cfg, "train")
    test_adapter = build_adapter(cfg, "test")
    ltr = Loader(train_adapter, cfg.batch_size, mesh=None, shuffle=True,
                 seed=cfg.random_seed, num_workers=2)
    lte = Loader(test_adapter, cfg.batch_size, mesh=None, shuffle=False,
                 seed=cfg.random_seed, num_workers=2)

    def mat(b):
        return {k: np.asarray(v) for k, v in b.items()}

    train_eps = [[mat(b) for b in ltr.epoch(e)] for e in range(epochs)]
    test_bs = [mat(b) for b in lte.epoch(0)]
    return train_eps, test_bs, len(train_adapter)


def _to_torch(batch: Dict[str, np.ndarray], *fields):
    """Shared converter core: padded rows dropped (valid mask) — the
    reference takes ragged final batches; trailing (label, idx) appended,
    idx as a column vector (History indexing). fields = (key, kind) with
    kind 'f' float / 'l' long / 'f0' float taking channel 0."""
    import torch
    n = int(batch["valid"].sum())
    out = []
    for key, kind in fields + (("label", "l"), ("idx", "l")):
        a = batch[key][:n, 0] if kind == "f0" else batch[key][:n]
        t = torch.from_numpy(a)
        out.append(t.long() if kind == "l" else t.float())
    out[-1] = out[-1].reshape(-1, 1)
    return tuple(out)


def to_torch_base(batch):
    """-> (spec, image, label, idx), the non-m3ae unpack (main.py:159-162)."""
    return _to_torch(batch, ("spec", "f0"), ("image", "f"))


def to_torch_m3ae(batch):
    """-> (token, padding_mask, image, label, idx), the m3ae unpack
    (main.py:153-157)."""
    return _to_torch(batch, ("token", "l"), ("padding_mask", "f"),
                     ("image", "f"))


def to_torch_large(batch):
    """-> (spec=fbank, image, label, idx) for lorb=large
    (main.py:159-162,166-168)."""
    return _to_torch(batch, ("fbank", "f"), ("image", "f"))


def to_torch_clip(batch):
    """-> (spec=token_feat, image=image_feat, label, idx) for the clip
    branch (main.py:159-162,270-273)."""
    return _to_torch(batch, ("token_feat", "f"), ("image_feat", "f"))


def to_torch_modal3(batch):
    """-> (token, padding_mask, image, spec=fbank, label, idx), the modal3
    unpack (main.py:145-151)."""
    return _to_torch(batch, ("token", "l"), ("padding_mask", "f"),
                     ("image", "f"), ("fbank", "f"))


@contextlib.contextmanager
def tiny_ref_m3ae(depth: int = 1, fix_droppath: bool = True,
                  cav: tuple = None):
    """Make the reference m3ae family runnable (and CPU-sized) for the A/B.

    - depth -> ``depth`` blocks via get_transformer_by_config; emb stays 768
      because the fusion/QMF head widths are HARDCODED to base's width
      (basic_model.py:149-180).
    - fix_droppath repairs the as-shipped DropPath crash: DropPath.forward's
      return line is commented out (m3ae.py:62) and Block calls it with the
      default deterministic=False (m3ae.py:148,153), so EVERY m3ae forward
      computes ``inputs + None`` -> TypeError, on GPU too (pinned by
      test_e2e_ab.py::test_reference_m3ae_droppath_crashes_as_shipped, which
      passes fix_droppath=False). Identity IS the intended math at
      drop_path=0: keep_prob 1 -> floor(1 + U[0,1)) == 1.
    - cav=(audio_length, msd, depth) additionally shrinks the modal3 audio
      branch's CAVMAEFT (basic_model.py:231 constructs it with hardcoded
      defaults): ctor kwargs for audio_length/modality_specific_depth, then
      blocks_u truncated to depth-msd (blocks_u = 12 - msd is hardwired,
      cav_mae.py:139).
    """
    import torch.nn as tnn

    ref = load_reference()
    rm3 = sys.modules["models.m3ae"]
    rbm = sys.modules["models.basic_model"]
    orig_cfg = rm3.get_transformer_by_config
    orig_dp = rm3.DropPath.forward
    orig_cav = rbm.CAVMAEFT

    def small_cfg(model_type, config):
        orig_cfg(model_type, config)
        config.depth = depth

    def small_cav(label_dim, **kw):
        a_len, msd, cdepth = cav[:3]
        kw["audio_length"] = a_len
        kw["modality_specific_depth"] = msd
        if len(cav) > 3:     # large family: the visual tower is live too
            kw["img_size"] = cav[3]
        m = orig_cav(label_dim, **kw)
        m.blocks_u = tnn.ModuleList(list(m.blocks_u)[:cdepth - msd])
        return m

    rm3.get_transformer_by_config = small_cfg
    if fix_droppath:
        rm3.DropPath.forward = lambda self, input, deterministic=False: input
    if cav is not None:
        rbm.CAVMAEFT = small_cav
    try:
        yield ref
    finally:
        rm3.get_transformer_by_config = orig_cfg
        rm3.DropPath.forward = orig_dp
        rbm.CAVMAEFT = orig_cav


# ---------------------------------------------------------------------------
# reference side
# ---------------------------------------------------------------------------

def run_reference(cfg, train_eps, test_bs, av_alpha: float = 0.55,
                  init_path: str = None):
    """main()'s model/optimizer setup (main.py:697-760) + the reference's own
    train_epoch/valid loop over the captured batches."""
    import torch
    import torch.nn as nn
    import torch.optim as optim_t

    ref = load_reference()
    args = ref_namespace(cfg, av_alpha)
    device = torch.device("cpu")

    ref.setup_seed(cfg.random_seed)
    if cfg.lorb in ("m3ae", "large"):
        # the ctors torch.load hardcoded '/path/to/{m3ae,cavmae}-*.pth'
        # (basic_model.py:108-117,166-174,234-242); {} + strict=False keeps
        # the random init.  NO weight_init for any of them (main.py:701-719)
        _load = torch.load
        torch.load = lambda *a, **k: {}
        try:
            model = (ref.CAVClassifier(args) if cfg.lorb == "large"
                     else ref.Modal3Classifier(args) if cfg.modal3
                     else ref.M3AEClassifier(args))
        finally:
            torch.load = _load
    elif cfg.clip:
        model = ref.CLIPClassifier(args)    # NO weight_init (main.py:715-716)
    else:
        model = ref.AVClassifier(args)
        model.apply(ref.weight_init)        # main.py:719
    model = nn.DataParallel(model)          # main.py:732 (CPU degenerate)
    if init_path:
        torch.save({"model": model.state_dict()}, init_path)

    optimizer = optim_t.SGD(model.parameters(), lr=cfg.learning_rate,
                            momentum=0.9, weight_decay=1e-4)  # main.py:749
    scheduler = optim_t.lr_scheduler.StepLR(optimizer, cfg.lr_decay_step,
                                            cfg.lr_decay_ratio)

    gs = ref.GSPlugin.__new__(ref.GSPlugin)  # __init__ is CUDA-only
    gs.Pl = torch.eye(512)
    gs.exp_count = 0

    n_data = sum(int(b["valid"].sum()) for b in train_eps[0])
    txt_history = ref.History(n_data)
    img_history = ref.History(n_data)
    # main.py:820-828 builds the third History only for modal3
    audio_history = ref.History(n_data) if cfg.modal3 else None

    conv = (to_torch_modal3 if cfg.modal3
            else to_torch_m3ae if cfg.lorb == "m3ae"
            else to_torch_large if cfg.lorb == "large"
            else to_torch_clip if cfg.clip
            else to_torch_base)
    train_t = [[conv(b) for b in ep] for ep in train_eps]
    test_t = [conv(b) for b in test_bs]

    loss_keys = ("loss", "loss_a", "loss_v") + (("loss_t",) if cfg.modal3
                                                else ())
    acc_keys = ("acc", "acc_a", "acc_v") + (("acc_t",) if cfg.modal3 else ())

    def run_valid():
        # modal3 eval threads the per-modality alphas (main.py:858-863);
        # the 2-modal call sites leave them at the function defaults
        kw = dict(a_alpha=args.a_alpha, v_alpha=args.v_alpha,
                  t_alpha=args.t_alpha) if cfg.modal3 else {}
        ret = ref.valid(args, model, device, test_t, gs_flag=cfg.gs_flag,
                        av_alpha=av_alpha, **kw)
        return dict(zip(acc_keys, ret))

    # eval-at-init: with bit-identical params this pins eval-path parity
    # independently of training-trajectory drift
    init_acc = run_valid()

    history = []
    for e, batches in enumerate(train_t):
        ret = ref.train_epoch(args, e, model, device, batches, optimizer,
                              scheduler, gs_plugin=gs, writer=None,
                              gs_flag=cfg.gs_flag, av_alpha=av_alpha,
                              txt_history=txt_history,
                              img_history=img_history,
                              audio_history=audio_history)
        history.append({"epoch": e, **dict(zip(loss_keys, ret)),
                        **run_valid()})
    return history, init_acc


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------

def run_ours(cfg, train_eps, test_bs, n_data: int, init_path: str):
    """This framework's jitted train/eval steps over the same batches, from
    the torch init imported through the checkpoint shim."""
    import jax
    import jax.numpy as jnp

    from mla_tpu.evals.metrics import make_eval_step, summarize_counts
    from mla_tpu.models.classifiers import build_classifier
    from mla_tpu.models.torch_import import load_torch_checkpoint
    from mla_tpu.train import optim, steps as steps_lib
    from mla_tpu.train.state import create_train_state

    model = build_classifier(cfg, dtype=jnp.float32)
    sample = {k: jnp.asarray(v) for k, v in train_eps[0][0].items()}
    spec = optim.make_spec(cfg)
    state = create_train_state(model, cfg, sample, spec, n_data=n_data,
                               seed=cfg.random_seed)
    params, stats = load_torch_checkpoint(init_path, cfg)

    def merge(dst, src):
        # structure-preserving: the torch QMF model also constructs the
        # (never-used, never-stepped) fusion_module (basic_model.py:31-47);
        # ours doesn't — keep our tree's structure, take matching leaves.
        if not isinstance(dst, dict):
            return jnp.asarray(src)
        return {k: (merge(v, src[k]) if k in src else v)
                for k, v in dst.items()}

    state = state.replace(params=merge(state.params, params),
                          batch_stats=merge(state.batch_stats, stats))

    len_dl = len(train_eps[0])
    train_step = jax.jit(steps_lib.make_train_step(model, cfg, spec, len_dl),
                         donate_argnums=0)
    eval_step = jax.jit(make_eval_step(model, cfg))

    def eval_all(st):
        totals = None
        for hb in test_bs:
            jb = {k: jnp.asarray(v) for k, v in hb.items()}
            counts = eval_step(st.params, st.batch_stats, jb)
            totals = counts if totals is None else \
                jax.tree_util.tree_map(jnp.add, totals, counts)
        return summarize_counts(totals)

    init_accs = eval_all(state)
    history = []
    for e, batches in enumerate(train_eps):
        lr = jnp.float32(optim.lr_for_epoch(cfg, e))
        msum, nb = None, 0
        for bi, hb in enumerate(batches):
            jb = {k: jnp.asarray(v) for k, v in hb.items()}
            state, metrics = train_step(state, jb, lr, jnp.int32(bi),
                                        jnp.int32(e))
            msum = metrics if msum is None else \
                jax.tree_util.tree_map(jnp.add, msum, metrics)
            nb += 1
        accs = eval_all(state)
        rec = {"epoch": e,
               "loss": float(msum["loss"]) / nb,
               "loss_a": float(msum["loss_a"]) / nb,
               "loss_v": float(msum["loss_v"]) / nb,
               "acc": accs["acc"], "acc_a": accs.get("acc_a", 0.0),
               "acc_v": accs.get("acc_v", 0.0)}
        if cfg.modal3:
            rec["loss_t"] = float(msum["loss_t"]) / nb
            rec["acc_t"] = accs.get("acc_t", 0.0)
        history.append(rec)
    return history, init_accs


# ---------------------------------------------------------------------------
# the A/B
# ---------------------------------------------------------------------------

CAV_TINY = (256, 1, 1)   # (audio_length, msd, depth) for the modal3 A/B


def run_ab(regime: str, root: str, workdir: str, epochs: int = 3,
           n_train: int = 48, n_test: int = 16, batch_size: int = 16,
           learning_rate: float = 2e-3, seed: int = 7, lorb: str = "base",
           modal3: bool = False, clip: bool = False):
    """One regime end-to-end A/B. regime in {'Normal', 'OGM', 'OGM_GE',
    'QMF', 'MLA', 'MLA_dynamic'}; families: lorb in {'base', 'm3ae',
    'large'} (m3ae = MVSA image-text with depth-1 768-wide encoders both
    sides, large = CREMA-D 2x tiny CAV-MAE — see tiny_ref_m3ae), modal3 =
    the IEMOCAP 3-modality family (CAV-MAE audio at CAV_TINY + 2x depth-1
    M3AE), clip = Food-101 precomputed features. Returns (ref_history,
    our_history, ref_init, our_init)."""
    import os

    from mla_tpu.core.config import MLAConfig
    from mla_tpu.data import synthetic

    if modal3:
        lorb = "m3ae"           # the only modal3 composition (config check)
    gs_flag = regime.startswith("MLA")
    common = dict(
        lorb=lorb, train=True,
        modulation="Normal" if (gs_flag or regime == "Normal") else regime,
        gs_flag=gs_flag, dynamic=regime.endswith("dynamic"),
        batch_size=batch_size, epochs=epochs,
        learning_rate=learning_rate, random_seed=seed,
        av_alpha=0.55, compute_dtype="float32",
        ghost_updates=False,        # torch 2.x semantics (module docstring)
        use_tensorboard=False, num_workers=2)

    def lists(r, tag):
        return os.path.exists(os.path.join(r, "lists", f"stat_{tag}.txt"))

    if modal3:
        if not lists(root, "iemo"):
            synthetic.make_iemocap(root, n_train=n_train, n_test=n_test,
                                   seed=1, token_len=64,
                                   fbank_len=CAV_TINY[0])
        cfg = MLAConfig(dataset="IEMOCAP", image_size=64, modal3=True,
                        m3ae_size="base1",       # == tiny_ref depth-1 768
                        audio_length=CAV_TINY[0], cav_blocks=CAV_TINY[1:],
                        data_root=root, **common).validate()
    elif lorb == "m3ae":
        if not lists(root, "mvsa"):
            synthetic.make_m3ae(root, dataset="MVSA", n_train=n_train,
                                n_test=n_test, seed=1, token_len=64)
        # 64px -> 16 image patches; both sides run 768-wide depth-1 encoders
        cfg = MLAConfig(dataset="MVSA", image_size=64, m3ae_size="base1",
                        data_root=root, **common).validate()
    elif lorb == "large":
        root = root + "_large"  # CREMA-D audio dir holds fbanks here, not
        if not lists(root, "cre"):  # spectrograms (shared-dir hazard)
            synthetic.make_cremad(root, n_train=n_train, n_test=n_test,
                                  seed=1, fbank=True, fbank_len=CAV_TINY[0])
        cfg = MLAConfig(dataset="CREMAD", image_size=64,
                        audio_length=CAV_TINY[0], cav_blocks=CAV_TINY[1:],
                        data_root=root, **common).validate()
    elif clip:
        root = root + "_clip"
        if not lists(root, "food"):
            synthetic.make_clip(root, n_train=n_train, n_test=n_test, seed=1)
        cfg = MLAConfig(dataset="Food101", clip=True, data_root=root,
                        **common).validate()
    else:
        if not lists(root, "cre"):
            synthetic.make_cremad(root, n_train=n_train, n_test=n_test,
                                  spec_shape=(64, 80), learnable=True, seed=1)
        cfg = MLAConfig(dataset="CREMAD", image_size=32, data_root=root,
                        **common).validate()

    train_eps, test_bs, n_data = capture_batches(cfg, epochs)
    tag = f"{lorb}{'3' if modal3 else ''}{'_clip' if clip else ''}"
    init_path = os.path.join(workdir, f"init_{tag}_{regime}.pth")
    if lorb in ("m3ae", "large"):
        # our side's tiny sizes come from cfg (m3ae_size=base1, cav_blocks);
        # the reference side gets the equivalent via tiny_ref_m3ae patches
        cav = (CAV_TINY if modal3
               else CAV_TINY + (cfg.image_size,) if lorb == "large"
               else None)
        with tiny_ref_m3ae(depth=1, cav=cav):
            ref_hist, ref_init = run_reference(cfg, train_eps, test_bs,
                                               av_alpha=0.55,
                                               init_path=init_path)
        our_hist, our_init = run_ours(cfg, train_eps, test_bs, n_data,
                                      init_path)
        return ref_hist, our_hist, ref_init, our_init
    ref_hist, ref_init = run_reference(cfg, train_eps, test_bs, av_alpha=0.55,
                                       init_path=init_path)
    our_hist, our_init = run_ours(cfg, train_eps, test_bs, n_data, init_path)
    return ref_hist, our_hist, ref_init, our_init


def trajectory_diffs(ref_hist: List[dict], our_hist: List[dict]):
    """Max abs per-epoch differences for loss keys and acc keys."""
    lk = [k for k in ("loss", "loss_a", "loss_v", "loss_t") if k in ref_hist[0]]
    ak = [k for k in ("acc", "acc_a", "acc_v", "acc_t") if k in ref_hist[0]]
    dl = max(abs(r[k] - o[k]) for r, o in zip(ref_hist, our_hist) for k in lk)
    da = max(abs(r[k] - o[k]) for r, o in zip(ref_hist, our_hist) for k in ak)
    return dl, da
