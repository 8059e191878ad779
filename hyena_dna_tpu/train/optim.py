"""Optimizer assembly: AdamW with per-parameter hyperparameter groups and
step-wise schedules.

Reproduces the reference's `_optim` mechanism
(`/root/reference/src/utils/train.py:142-156`,
`src/models/sequence/hyena.py:222-227`, `train.py:443-523`) on optax:

  * Hyena filter-MLP weights train at their own lr (default 1e-3, wired to
    `optimizer.lr` in the hg38 config) with weight_decay 0.
  * The positional-embedding `z` trains at `lr_pos_emb` (0 = frozen — the
    reference freezes via `requires_grad=False` when lr==0).
  * Modulation `deltas` are frozen by default (`modulation_lr=0.0`,
    reference `hyena.py:141`).
  * Bias / LayerNorm / Embedding parameters get weight_decay 0
    (`src/utils/optim_groups.py:14-38`).
  * Everything else: main lr/wd.

Schedules are python callables `step -> lr`, matching the reference's
step-interval timm cosine (`src/utils/optim/schedulers.py:66-87`) and the
CosineWarmup / InvSqrt / Constant variants (`schedulers.py:11-64`).

The group structure is expressed with `optax.multi_transform` over a label
tree derived purely from parameter *paths* — the flax analog of the
reference's per-tensor `_optim` attributes.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


# --------------------------------------------------------------------------
# schedules (step -> lr), mirroring src/utils/optim/schedulers.py
# --------------------------------------------------------------------------


def timm_cosine(
    base_lr: float,
    t_initial: int,
    lr_min: float = 0.0,
    warmup_t: int = 0,
    warmup_lr_init: float = 0.0,
    cycle_limit: int = 1,
    t_in_epochs: bool = False,  # accepted for config parity; steps only here
    **_,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """timm CosineLRScheduler semantics: linear warmup from warmup_lr_init to
    base_lr over warmup_t, then cosine from base_lr to lr_min over
    (t_initial - warmup_t); holds lr_min after cycle_limit cycles."""
    t_initial = max(int(t_initial), 1)
    warmup_t = int(warmup_t)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr_init + step * (
            (base_lr - warmup_lr_init) / max(warmup_t, 1)
        )
        t = jnp.clip(step - warmup_t, 0, max(t_initial - warmup_t, 1))
        frac = t / max(t_initial - warmup_t, 1)
        cos = lr_min + 0.5 * (base_lr - lr_min) * (1 + jnp.cos(math.pi * frac))
        return jnp.where(step < warmup_t, warm, cos)

    return schedule


def cosine_warmup(base_lr: float, T_max: int, eta_min: float = 0.0, warmup_step: int = 0, **_):
    """torch CosineAnnealingLR + linear warmup (`schedulers.py:11-37`)."""
    T = max(int(T_max) - int(warmup_step), 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / max(warmup_step, 1)
        t = jnp.clip(step - warmup_step, 0, T)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(math.pi * t / T))
        return jnp.where(step < warmup_step, warm, cos)

    return schedule


def invsqrt(base_lr: float, warmup_step: int = 0, **_):
    """Attention-is-all-you-need inverse sqrt (`schedulers.py:40-52`)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / jnp.maximum(warmup_step, 1) ** 1.5
        decay = base_lr / jnp.sqrt(jnp.maximum(step, 1.0))
        return jnp.where(step <= warmup_step, warm, decay)

    return schedule


def constant_warmup(base_lr: float, warmup_step: int = 0, **_):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / max(warmup_step, 1)
        return jnp.where(step < warmup_step, warm, base_lr)

    return schedule


def constant(base_lr: float, **_):
    return lambda step: jnp.full_like(jnp.asarray(step, jnp.float32), base_lr)


SCHEDULE_REGISTRY: Dict[str, Callable] = {
    "cosine_warmup_timm": timm_cosine,
    "cosine_warmup": cosine_warmup,
    "invsqrt": invsqrt,
    "constant_warmup": constant_warmup,
    "constant": constant,
}


# --------------------------------------------------------------------------
# parameter labeling
# --------------------------------------------------------------------------

NO_DECAY_SUBSTRINGS = ("norm1", "norm2", "ln_f", "word_embeddings", "position_embeddings")


def _label_for_path(path: tuple[str, ...]) -> str:
    joined = "/".join(path)
    leaf = path[-1]
    if "filter_fn" in path:
        if leaf == "pos_emb_z":
            return "pos_emb"
        if leaf == "deltas":
            return "modulation"
        if leaf in ("bias",) and path[-2] == "filter_fn":
            # conv D-skip bias: plain param; bias => no decay
            return "no_decay"
        if leaf == "freq":
            # the reference attaches `_optim` to every implicit_filter child
            # parameter incl. Sin.freq (`hyena.py:224-227`): filter lr, wd 0
            return "filter"
        return "filter"  # implicit-MLP kernels/biases
    if leaf == "bias" or any(s in joined for s in NO_DECAY_SUBSTRINGS):
        return "no_decay"
    return "main"


def label_params(params) -> Any:
    """Build a pytree of group labels matching `params`' structure."""
    flat = traverse_util.flatten_dict(params)
    labels = {path: _label_for_path(path) for path in flat}
    return traverse_util.unflatten_dict(labels)


# --------------------------------------------------------------------------
# optimizer builder
# --------------------------------------------------------------------------


def _adamw(lr_schedule, weight_decay, betas, eps):
    return optax.adamw(
        learning_rate=lr_schedule,
        b1=betas[0],
        b2=betas[1],
        eps=eps,
        weight_decay=weight_decay,
    )


class _LambState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def lamb(learning_rate, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-6, weight_decay: float = 0.0,
         adam: bool = False) -> optax.GradientTransformation:
    """LAMB with the reference JITLamb's exact semantics
    (`/root/reference/src/utils/optim/lamb.py:148-167,224-248`, registered
    as optimizer `lamb` in `src/utils/registry.py:6`): NO bias correction
    (paper v3), weight decay added to the normalized Adam step BEFORE the
    trust ratio, weight norm clamped to [0, 10], trust ratio forced to 1
    where either norm is zero. `adam=True` fixes trust_ratio=1 (the
    reference's comparison mode). optax.lamb differs (bias correction +
    unclamped norms), hence this explicit transform.
    """

    def init(params):
        zeros = lambda p: jnp.zeros_like(p)
        return _LambState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("lamb requires params")
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, updates)
        # Evaluate the schedule at the PRE-increment count (first step uses
        # schedule(0)) to match the optax convention used by the adamw/adam
        # branches — switching optimizer._name_ must not shift warmup by one.
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        count = state.count + 1

        def delta(m, v, p):
            f32 = jnp.float32
            a = m.astype(f32) / (jnp.sqrt(v.astype(f32)) + eps)
            a = a + weight_decay * p.astype(f32)
            if adam:
                trust = 1.0
            else:
                wn = jnp.clip(jnp.linalg.norm(p.astype(f32)), 0.0, 10.0)
                an = jnp.linalg.norm(a)
                trust = jnp.where((wn == 0.0) | (an == 0.0), 1.0,
                                  wn / (an + eps))
            return (-lr * trust * a).astype(p.dtype)

        new_updates = jax.tree_util.tree_map(delta, mu, nu, params)
        return new_updates, _LambState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class _FlatGroupState(NamedTuple):
    inner: Dict[str, Any]  # bucket key -> inner transform state on a flat vec


def _flat_multi_transform(
    transforms: Dict[str, optax.GradientTransformation],
    labels,
    params_template,
    gradient_clip_val: Optional[float],
) -> optax.GradientTransformation:
    """multi_transform + clip_by_global_norm in FLAT space.

    The tree-form optimizer update is dispatch-bound on TPU: ~170 small
    leaves x (clip reduction + 5 adamw elementwise ops) is hundreds of
    microkernels, measured 2.8 ms/step at the 32k bench shape where the
    HBM traffic floor is ~0.3 ms. This transform concatenates each label
    group's leaves into one 1-D vector per (label, dtype) bucket, runs the
    global-norm clip and the inner transform's math on those few vectors,
    and splits the updates back (pure slices/reshapes). Numerics match the
    tree form up to reduction order (see tests/test_train.py).

    Not used for lamb: its trust ratio is per-PARAMETER (per leaf), which
    flattening would silently change.
    """
    flat_params = traverse_util.flatten_dict(params_template)
    flat_labels = traverse_util.flatten_dict(labels)
    paths = sorted(flat_params)
    # bucket key -> ordered list of (path, shape, size)
    buckets: Dict[tuple, list] = {}
    for path in paths:
        p = flat_params[path]
        key = (flat_labels[path], jnp.dtype(p.dtype).name)
        buckets.setdefault(key, []).append(
            (path, tuple(p.shape), int(p.size)))

    def _gather(tree):
        flat = traverse_util.flatten_dict(tree)
        return {
            key: jnp.concatenate([flat[path].reshape(-1)
                                  for path, _, _ in items])
            for key, items in buckets.items()
        }

    def _scatter(vecs):
        out = {}
        for key, items in buckets.items():
            vec = vecs[key]
            off = 0
            for path, shape, size in items:
                out[path] = vec[off:off + size].reshape(shape)
                off += size
        return traverse_util.unflatten_dict(out)

    def init(params):
        vecs = _gather(params)
        return _FlatGroupState(inner={
            "/".join(map(str, key)): transforms[key[0]].init(vecs[key])
            for key in buckets
        })

    def update(updates, state, params=None):
        g = _gather(updates)
        if gradient_clip_val:
            # exact optax.clip_by_global_norm semantics over ALL leaves
            gn = jnp.sqrt(sum(jnp.sum(v.astype(jnp.float32) ** 2)
                              for v in g.values()))
            factor = jnp.where(gn > gradient_clip_val,
                               gradient_clip_val / gn, 1.0)
            g = {k: (v.astype(jnp.float32) * factor).astype(v.dtype)
                 for k, v in g.items()}
        p = _gather(params) if params is not None else None
        new_inner = {}
        out_vecs = {}
        for key in buckets:
            skey = "/".join(map(str, key))
            upd, new_inner[skey] = transforms[key[0]].update(
                g[key], state.inner[skey],
                p[key] if p is not None else None)
            out_vecs[key] = upd
        return _scatter(out_vecs), _FlatGroupState(inner=new_inner)

    return optax.GradientTransformation(init, update)


def build_optimizer(
    params,
    lr: float = 6e-4,
    weight_decay: float = 0.1,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    filter_lr: Optional[float] = 1e-3,
    filter_wd: float = 0.0,
    lr_pos_emb: float = 1e-5,
    modulation_lr: float = 0.0,
    scheduler: Optional[dict] = None,
    gradient_clip_val: Optional[float] = 1.0,
    frozen: Optional[Dict[tuple, Any]] = None,
    optimizer_name: str = "adamw",
    flatten: Optional[bool] = None,
) -> tuple[optax.GradientTransformation, Any]:
    """Returns (optimizer, label_tree).

    `scheduler` is e.g. {"_name_": "cosine_warmup_timm", "t_initial": ...};
    the schedule shape is shared across groups but anchored at each group's
    own base lr, like timm scaling every param-group lr.

    `frozen`: optional flat {param_path: "frozen"|None} overrides (from the
    load_backbone hook's freeze_backbone) — "frozen" paths get zero updates,
    the reference's requires_grad=False (`long_conv_lm.py:612-621`).
    """
    sched_cfg = dict(scheduler or {"_name_": "constant"})
    sched_name = sched_cfg.pop("_name_", "constant")
    sched_fn = SCHEDULE_REGISTRY[sched_name]

    if optimizer_name not in ("adamw", "adam", "lamb"):
        raise ValueError(f"unknown optimizer {optimizer_name!r}")

    def make(base_lr, wd):
        if base_lr == 0.0:
            return optax.set_to_zero()  # frozen (reference requires_grad=False)
        if optimizer_name == "lamb":
            return lamb(sched_fn(base_lr, **sched_cfg), b1=betas[0],
                        b2=betas[1], eps=eps, weight_decay=wd)
        if optimizer_name == "adam":
            # torch.optim.Adam semantics: COUPLED L2 (wd*param added to the
            # gradient before the moment updates), unlike AdamW
            return optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.adam(sched_fn(base_lr, **sched_cfg),
                           b1=betas[0], b2=betas[1], eps=eps),
            )
        return _adamw(sched_fn(base_lr, **sched_cfg), wd, betas, eps)

    transforms = {
        "main": make(lr, weight_decay),
        "no_decay": make(lr, 0.0),
        "filter": make(lr if filter_lr is None else filter_lr, filter_wd),
        "pos_emb": make(lr_pos_emb, 0.0),
        "modulation": make(modulation_lr, 0.0),
        "frozen": optax.set_to_zero(),
    }
    labels = label_params(params)
    if frozen:
        flat = traverse_util.flatten_dict(labels)
        for path, lab in frozen.items():
            if lab == "frozen" and path in flat:
                flat[path] = "frozen"
        labels = traverse_util.unflatten_dict(flat)
    if flatten is None:
        # Measured OFF (v5e, 32k bench shape, 6.5M params): the flat form's
        # concat/slice copies cost MORE than the per-leaf op overhead they
        # remove — opt_update 3.19 ms flat vs 2.80 ms tree (TPU programs are
        # statically scheduled; there is no per-kernel host dispatch to
        # amortize). Kept as an option: a param-count-heavy model (many
        # thousands of leaves) would flip this verdict.
        flatten = False
    if flatten and optimizer_name == "lamb":
        raise ValueError("flatten=True would change lamb's per-parameter "
                         "trust ratio; use the tree form")
    if flatten:
        return (
            _flat_multi_transform(transforms, labels, params,
                                  gradient_clip_val),
            labels,
        )
    tx = optax.multi_transform(transforms, labels)
    if gradient_clip_val:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip_val), tx)
    return tx, labels
