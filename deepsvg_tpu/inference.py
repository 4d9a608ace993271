"""High-level inference API: encode / decode / interpolate / font sampling.

This is the surface the reference exposes through its notebooks and
``gui/interpolate.py:30-126`` (encode_svg, decode, interpolate_svg,
finetune_model), re-designed batch-first: latent interpolation and class
sampling decode *all* frames in one jitted, vmapped call instead of a Python
loop of per-frame forwards.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models.model import SVGTransformer
from .models.sample import flatten_groups_np, greedy_sample
from .svglib.geom import Bbox
from .svglib.svg import SVG
from .svgtensor.tensor import cmd_args_to_data14


def easein_easeout(t):
    """Smooth-step easing (reference gui/utils.py:61-62)."""
    return t * t / (2.0 * (t * t - t) + 1.0)


class InferenceSession:
    """A loaded model + (optional) dataset, exposing the user-facing ops.

    Args:
        model: the SVGTransformer module.
        variables: flax variables dict ``{"params": ...}``.
        dataset: optional dataset (provides ``get`` for svg -> model-args
            packing); required for ``encode_svg``.
        cfg: training config (for ``model_args``); falls back to the model
            config's ``get_model_args``.
    """

    def __init__(self, model: SVGTransformer, variables, dataset=None, cfg=None):
        self.model = model
        self.variables = variables
        self.dataset = dataset
        self.model_args = (
            cfg.model_args if cfg is not None else model.cfg.get_model_args()
        )

        # posterior MEAN for VAE variants: session encodes feed editing /
        # interpolation / serving, where a stochastic z would make repeated
        # encodes of the same icon disagree (the deterministic flagship is
        # unaffected; greedy_sample keeps the reference's sampling semantics)
        self._encode = jax.jit(
            lambda v, c, a: model.apply(v, c, a, None, None, encode_mode=True,
                                        sample_vae=False)
        )
        self._encode_label = None  # built lazily on first labeled encode
        self._decode = jax.jit(
            partial(greedy_sample, model)
        )

    def _check_tokens(self, name: str, v: np.ndarray):
        """Integer inputs outside the embedding table produce silent NaN on
        TPU (``jnp.take`` out-of-bounds is undefined, not an error), so the
        public boundary validates on host where a real exception is cheap."""
        cfg = self.model.cfg
        if name.startswith("commands"):
            lo, hi = 0, cfg.n_commands - 1
        elif name.startswith("args"):
            lo, hi = -1, cfg.args_dim - 1  # PAD_VAL .. quantization grid max
        else:
            return
        if not v.size:
            return
        mn, mx = int(v.min()), int(v.max())
        if mn < lo or mx > hi:
            raise ValueError(
                f"{name} contains values outside [{lo}, {hi}] "
                f"(got min {mn}, max {mx}); out-of-range tokens would "
                f"produce silent NaN on TPU")

    def _check_label(self, label):
        if label is None:
            return
        v = np.asarray(label)
        if v.size and (int(v.min()) < 0
                       or int(v.max()) >= self.model.cfg.n_labels):
            raise ValueError(
                f"label out of range [0, {self.model.cfg.n_labels - 1}] "
                f"(got min {int(v.min())}, max {int(v.max())}); "
                f"out-of-range labels would produce silent NaN on TPU")

    # --- encode ----------------------------------------------------------
    def encode(self, batch: dict) -> jnp.ndarray:
        """Packed model-args dict (unbatched or batched) -> latent ``[N, dz]``.

        Label-conditioned models (fonts) read the class from ``batch
        ["label"]`` — required, the encoder cannot run without it."""
        args = []
        for k in self.model_args[:2]:
            v = np.asarray(batch[k])
            # add the batch axis if the dict holds a single unbatched item:
            # commands come as [G, S] (-> [1, G, S]), args as [G, S, 11]
            unbatched_ndim = 3 if k.startswith("args") else 2
            if v.ndim == unbatched_ndim:
                v = v[None]
            self._check_tokens(k, v)
            args.append(jnp.asarray(v))
        if "label" in self.model_args:
            if "label" not in batch:
                raise ValueError(
                    "this model is label-conditioned: encode() needs "
                    "batch['label'] (class ids)")
            lab = np.atleast_1d(np.asarray(batch["label"]))
            self._check_label(lab)
            if self._encode_label is None:
                m = self.model
                self._encode_label = jax.jit(
                    lambda v, c, a, l: m.apply(
                        v, c, a, None, None, label=l, encode_mode=True,
                        sample_vae=False))
            return self._encode_label(self.variables, *args,
                                      jnp.asarray(lab, jnp.int32))
        return self._encode(self.variables, *args)

    def encode_svg(self, svg: SVG) -> jnp.ndarray:
        """SVG document -> latent (gui/interpolate.py:37-42).

        Without an attached dataset a bare packer is built from the model
        config (the dataset is only needed here for its tensor packing, not
        its files — lets editor/GUI sessions run standalone)."""
        if self.dataset is None:
            import pandas as pd

            from .data.dataset import SVGDataset

            mcfg = self.model.cfg
            self.dataset = SVGDataset(
                ".", None, self.model_args, mcfg.max_num_groups,
                mcfg.max_seq_len, df=pd.DataFrame(),
            )
        data = self.dataset.get(model_args=self.model_args, svg=svg)
        return self.encode(data)

    def encode_icon(self, idx=None, id=None) -> jnp.ndarray:
        data = self.dataset.get(idx=idx or 0, id=id, model_args=self.model_args,
                                random_aug=False)
        return self.encode(data)

    # --- decode ----------------------------------------------------------
    def decode(self, z: jnp.ndarray, label=None, viewbox: int = 256,
               normalize: bool = True, colored: bool = False) -> List[SVG]:
        """Latents ``[N, dz]`` -> list of SVG documents (one batched forward)."""
        if z.ndim == 1:
            z = z[None]
        self._check_label(label)
        commands_y, args_y = self._decode(self.variables, z=z, label=label)
        out = []
        for c, a in flatten_groups_np(commands_y, args_y):
            data14 = cmd_args_to_data14(c, a)
            try:
                svg = SVG.from_tensor(data14, viewbox=Bbox(viewbox), allow_empty=True)
                if normalize:
                    svg = svg.normalize()
                if colored:
                    svg = svg.split_paths().set_color("random")
            except Exception:
                svg = SVG([], viewbox=Bbox(viewbox))
            out.append(svg)
        return out

    def decode_one(self, z, **kwargs) -> SVG:
        return self.decode(z, **kwargs)[0]

    # --- latent ops ------------------------------------------------------
    def interpolate(self, z1: jnp.ndarray, z2: jnp.ndarray, n: int = 10,
                    ease: bool = True, include_endpoints: bool = False,
                    label=None) -> List[SVG]:
        """Linear latent interpolation, decoded as ONE batch
        (gui/interpolate.py:45-55, batched)."""
        z1, z2 = z1.reshape(1, -1), z2.reshape(1, -1)
        alphas = jnp.linspace(0.0, 1.0, n + 2)
        if not include_endpoints:
            alphas = alphas[1:-1]
        if ease:
            alphas = easein_easeout(alphas)
        zs = (1 - alphas[:, None]) * z1 + alphas[:, None] * z2
        if label is not None:
            label = jnp.broadcast_to(jnp.asarray(label).reshape(1), (zs.shape[0],))
        return self.decode(zs, label=label)

    def interpolate_svg(self, svg1: SVG, svg2: SVG, n: int = 10, ease: bool = True) -> List[SVG]:
        return self.interpolate(self.encode_svg(svg1), self.encode_svg(svg2), n=n, ease=ease)

    def latent_direction(self, svgs_from: Sequence[SVG], svgs_to: Sequence[SVG]) -> jnp.ndarray:
        """Mean latent difference — the 'latent arithmetic direction' of the
        latent_ops notebook (e.g. path-removal, squarify)."""
        z_from = jnp.concatenate([self.encode_svg(s) for s in svgs_from]).mean(0)
        z_to = jnp.concatenate([self.encode_svg(s) for s in svgs_to]).mean(0)
        return z_to - z_from

    def apply_direction(self, z, direction, amounts: Sequence[float], label=None) -> List[SVG]:
        zs = jnp.stack([z.reshape(-1) + a * direction for a in amounts])
        return self.decode(zs, label=label)

    # --- font sampling ---------------------------------------------------
    def sample_class(self, label: int, n: int = 1, scale: float = 1.0,
                     key: Optional[jax.Array] = None) -> List[SVG]:
        """Label-conditioned glyph sampling (fonts notebook): decode latents
        drawn from the prior."""
        if key is None:
            key = jax.random.PRNGKey(0)
        z = scale * jax.random.normal(key, (n, self.model.cfg.dim_z))
        labels = jnp.full((n,), label, jnp.int32)
        return self.decode(z, label=labels)

    def random_sample(self, n: int = 1, scale: float = 1.0,
                      key: Optional[jax.Array] = None) -> List[SVG]:
        if key is None:
            key = jax.random.PRNGKey(0)
        z = scale * jax.random.normal(key, (n, self.model.cfg.dim_z))
        return self.decode(z)


def load_session(config_module: str, checkpoint_path: str, dataset=None,
                 num_devices: int = 1) -> InferenceSession:
    """Convenience: build a session from an experiment config + weights file.

    ``checkpoint_path`` may be this framework's checkpoint OR a reference
    PyTorch ``.pth.tar`` (e.g. the published pretrained
    ``hierarchical_ordered{,_fonts}.pth.tar``), which is imported via
    :func:`deepsvg_tpu.models.load_torch_checkpoint`."""
    from .training.checkpoint import load_model
    from .training.config import load_config

    cfg = load_config(config_module, num_devices)
    model = cfg.make_model()

    if checkpoint_path.endswith((".pth.tar", ".pth", ".pt")):
        from .models.torch_import import load_torch_checkpoint

        params = load_torch_checkpoint(checkpoint_path, model.cfg)
        return InferenceSession(model, {"params": params}, dataset=dataset, cfg=cfg)

    # full TRAIN checkpoints (raw-v2, params + optimizer state) are sniffed
    # by magic and restored through a train-state template; weights-only
    # files go through flax msgpack (load_model)
    from .training.checkpoint import _CKPT_MAGIC

    with open(checkpoint_path, "rb") as f:
        head = f.read(len(_CKPT_MAGIC))
    # v2 magic, or v1 train checkpoints (npz = zip magic)
    is_train_ckpt = head == _CKPT_MAGIC or head[:4] == b"PK\x03\x04"

    # init to get a params template
    from .data.synthetic import generate_batch

    rng = np.random.default_rng(0)
    b = generate_batch(rng, 1, model.cfg.max_num_groups, model.cfg.max_seq_len)
    if "label" in cfg.model_args:
        b["label"] = np.zeros((1,), np.int32)

    if is_train_ckpt:
        from .training.checkpoint import load_ckpt
        from .training.trainer import create_train_state

        batch = {k: jnp.asarray(b[k]) for k in set(cfg.model_args)}
        # the optimizer only shapes the opt_state leaves of the template;
        # steps_per_epoch alters the schedule function, not the state tree
        template = create_train_state(
            model, cfg.make_optimizer(1), batch, list(cfg.model_args))
        state, found = load_ckpt(checkpoint_path, template)
        assert found, checkpoint_path
        return InferenceSession(model, {"params": state.params},
                                dataset=dataset, cfg=cfg)

    tensor_args = [jnp.asarray(b[k]) for k in cfg.model_args if k != "label"]
    label = (
        jnp.zeros((1,), jnp.int32) if "label" in cfg.model_args else None
    )
    rngs = {"params": jax.random.PRNGKey(0)}
    if model.cfg.use_vae:
        rngs["vae"] = jax.random.PRNGKey(1)
    variables = model.init(rngs, *tensor_args, label=label)
    params = load_model(checkpoint_path, variables["params"])
    return InferenceSession(model, {"params": params}, dataset=dataset, cfg=cfg)
