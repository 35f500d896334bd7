"""Functional module system with PyTorch-``state_dict``-shaped parameter trees.

Design goals (see SURVEY.md §5.4, §7.1):

* Parameters live in plain nested dicts ("trees") whose flattened
  dot-joined keys are byte-for-byte the reference's ``state_dict`` keys
  (e.g. ``"fusion_layers.0.0.weight"``) so PyTorch checkpoints round-trip.
* Modules are *stateless descriptions*: ``init`` builds a tree,
  ``apply(tree, ctx, ...)`` is a pure function of it.  This makes whole
  populations of models a leading ``vmap`` axis and training steps
  trivially ``jit``/``pjit``-able.
* Mutable-at-train-time values (BatchNorm running stats) are returned
  through ``Ctx.updates`` — a path-keyed dict that the caller folds back
  into the tree, keeping everything functional under ``jit``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# RNG stream
# --------------------------------------------------------------------------
class Rng:
    """A splittable stream of PRNG keys consumed sequentially."""

    def __init__(self, key_or_seed):
        if isinstance(key_or_seed, int):
            key_or_seed = jax.random.PRNGKey(key_or_seed)
        self._key = key_or_seed

    def next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def fork(self):
        return Rng(self.next())


class Ctx:
    """Per-forward context: train/eval mode, RNG stream, buffer updates."""

    def __init__(self, train: bool = False, rng=None):
        self.train = train
        if rng is not None and not isinstance(rng, Rng):
            rng = Rng(rng)
        self.rng = rng
        self.updates: dict = {}

    def next_rng(self):
        if self.rng is None:
            raise ValueError(
                "this forward pass draws randomness (dropout/droppath in train "
                "mode) — construct Ctx(train=True, rng=<seed or key>)"
            )
        return self.rng.next()

    def put_update(self, path: str, value):
        self.updates[path] = value


# --------------------------------------------------------------------------
# tree helpers
# --------------------------------------------------------------------------
def flatten_tree(tree: dict, prefix: str = "") -> dict:
    """Nested dict -> flat {dot.joined.path: leaf} (state_dict shape)."""
    out = {}
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_tree(v, p))
        else:
            out[p] = v
    return out


def unflatten_tree(flat: dict) -> dict:
    out: dict = {}
    for path, v in flat.items():
        parts = path.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def tree_get(tree: dict, path: str):
    node = tree
    for p in path.split("."):
        node = node[p]
    return node


def tree_set(tree: dict, path: str, value) -> dict:
    """Functionally set ``path`` in ``tree`` (returns a new nested dict).
    The leaf must already exist — silently grafting a new leaf would mask
    bugs like buffer updates keyed by unfinalized (empty) module paths."""
    parts = path.split(".")

    def rec(node, i):
        if parts[i] not in node:
            raise KeyError(
                f"tree_set: no leaf at {path!r} (missing {parts[i]!r}); "
                "was the model finalize()d / init()ed?")
        if i == len(parts) - 1:
            new = dict(node)
            new[parts[i]] = value
            return new
        new = dict(node)
        new[parts[i]] = rec(node[parts[i]], i + 1)
        return new

    return rec(tree, 0)


def apply_updates(tree: dict, updates: dict) -> dict:
    for path, value in updates.items():
        tree = tree_set(tree, path, value)
    return tree


def partition(tree: dict, predicate) -> tuple[dict, dict]:
    """Split a tree into (selected, rest) by ``predicate(path)``.

    Both halves keep the full nested structure with ``None`` leaves for the
    other half, so ``jax.grad`` w.r.t. the selected half skips frozen
    parameters entirely (None is an empty pytree node).
    """

    def rec(node, prefix):
        sel, rest = {}, {}
        for k, v in node.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                s, r = rec(v, p)
                sel[k], rest[k] = s, r
            else:
                if predicate(p):
                    sel[k], rest[k] = v, None
                else:
                    sel[k], rest[k] = None, v
        return sel, rest

    return rec(tree, "")


def merge(a: dict, b: dict) -> dict:
    """Inverse of :func:`partition`: take non-None leaf from either side."""
    out = {}
    for k in a.keys():
        va, vb = a[k], b[k]
        if isinstance(va, dict):
            out[k] = merge(va, vb)
        else:
            out[k] = vb if va is None else va
    return out


def prefix_predicate(prefixes):
    """Match a flat path against any of the dotted prefixes."""
    prefixes = tuple(prefixes)

    def pred(path: str) -> bool:
        return any(path == p or path.startswith(p + ".") for p in prefixes)

    return pred


def tree_size(tree: dict) -> int:
    return sum(v.size for v in flatten_tree(tree).values() if v is not None)


# BatchNorm running-stat buffer names: mixed-precision casts skip these —
# re-quantizing the carried EMA to a narrow dtype on every cast would decay
# the statistics (the BN layer itself casts them to the activation dtype
# just for the normalization math, without writing the cast back)
BN_BUFFERS = ("running_mean", "running_var", "num_batches_tracked")


def cast_compute(tree, dtype):
    """Cast every floating leaf of ``tree`` (any pytree) to ``dtype``,
    EXCEPT BatchNorm running-stat buffers (``BN_BUFFERS``).  No-op when
    ``dtype`` is None.  The mixed-precision primitive shared by the train
    engines (per-step compute cast) and the serving export (weights baked
    as bf16 constants)."""
    if dtype is None:
        return tree
    dt = jnp.dtype(dtype)

    def cast(path, x):
        if path and getattr(path[-1], "key", None) in BN_BUFFERS:
            return x
        return x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree_util.tree_map_with_path(cast, tree)


# --------------------------------------------------------------------------
# Module
# --------------------------------------------------------------------------
class Module:
    """Base class. Subclasses register children by attribute assignment and
    implement ``create``/``leaf_kinds`` (own leaves) and ``apply``."""

    def __init__(self):
        object.__setattr__(self, "_children", {})
        object.__setattr__(self, "_path", "")
        object.__setattr__(self, "_direct_params", {})

    def __setattr__(self, name, value):
        # tolerate attribute assignment before super().__init__() (common
        # torch idiom: stash config first) — _children may not exist yet
        children = self.__dict__.get("_children")
        if isinstance(value, Module):
            if children is None:
                raise AttributeError(
                    "assigning a Module child before Module.__init__; "
                    "call super().__init__() first")
            children[name] = value
        elif children is not None:
            # reassigning a child attribute to a non-Module (torch's
            # `self.downsample = None` idiom) must unregister it, or init()
            # would keep creating phantom parameters for it
            children.pop(name, None)
        object.__setattr__(self, name, value)

    def declare_param(self, name, shape, init):
        """A bare learnable tensor leaf on this module (torch nn.Parameter
        attribute equivalent — same state_dict key, no suffix)."""
        self._direct_params[name] = (tuple(shape), init)

    # ----- structure
    def named_children(self):
        return self._children.items()

    def finalize(self, path: str = ""):
        """Assign dotted paths (used for buffer updates). Idempotent."""
        object.__setattr__(self, "_path", path)
        for name, child in self._children.items():
            child.finalize(f"{path}.{name}" if path else name)
        return self

    @property
    def path(self) -> str:
        return self._path

    def modules(self):
        yield self
        for c in self._children.values():
            yield from c.modules()

    # ----- leaves (overridden by parameterized layers)
    def create(self, rng: Rng) -> dict:
        return {name: init(rng.next(), shape)
                for name, (shape, init) in self._direct_params.items()}

    def leaf_kinds(self) -> dict:
        """Own leaves: name -> 'param' | 'buffer'."""
        return {name: "param" for name in self._direct_params}

    # ----- tree building
    def init(self, rng, compile=None) -> dict:
        """Draw the parameter tree.

        compile: run the whole init as ONE jitted program instead of one
        eager op per leaf. Identical numerics (jax.random is
        jit-invariant); the win is dispatch count — a remote-dispatch TPU
        backend pays ~ms per eager op, ~500 of them for the NTU
        backbones. Default (None): auto — compiled on non-CPU backends,
        eager on CPU (where tiny per-test models would pay more in
        trace+compile than they save)."""
        if not isinstance(rng, Rng):
            rng = Rng(rng)
        self.finalize(self._path)
        if compile is None:
            # compiled init wins when dispatch count dominates (backbones:
            # hundreds of leaves x ~ms remote dispatch each); small fusion
            # heads pay more in per-call trace than they save
            n_leaves = sum(len(m._direct_params) for m in self.modules())
            compile = jax.default_backend() != "cpu" and n_leaves >= 100
        if compile:
            def build(key):
                r = Rng(key)
                tree = self._init(r)
                # the caller's stream advances exactly as the eager path's
                return tree, r._key
            try:
                tree, rng._key = jax.jit(build)(rng._key)
                return tree
            except Exception as e:   # a custom create() that doesn't trace
                import warnings
                warnings.warn(
                    f"compiled init fell back to eager: {e!r}",
                    RuntimeWarning, stacklevel=2)
        return self._init(rng)

    def _init(self, rng: Rng) -> dict:
        tree = dict(self.create(rng))
        for name, child in self._children.items():
            sub = child._init(rng)
            if sub:
                tree[name] = sub
        return tree

    def kinds(self) -> dict:
        tree = dict(self.leaf_kinds())
        for name, child in self._children.items():
            sub = child.kinds()
            if sub:
                tree[name] = sub
        return tree

    def param_predicate(self):
        """Predicate(path) -> True for trainable parameters (not buffers)."""
        kinds = flatten_tree(self.kinds())

        def pred(path):
            return kinds.get(path) == "param"

        return pred

    # ----- forward
    def apply(self, tree, ctx: Ctx, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, tree, ctx: Ctx, *args, **kwargs):
        return self.apply(tree, ctx, *args, **kwargs)

    # convenience: fetch the subtree for a child that may own no leaves
    @staticmethod
    def sub(tree, name) -> dict:
        return tree.get(str(name), {}) if tree else {}


class ModuleList(Module):
    def __init__(self, mods=()):
        super().__init__()
        object.__setattr__(self, "_n", 0)
        for m in mods:
            self.append(m)

    def append(self, m: Module):
        self._children[str(self._n)] = m
        object.__setattr__(self, "_n", self._n + 1)

    def __getitem__(self, i: int) -> Module:
        return self._children[str(i if i >= 0 else self._n + i)]

    def __len__(self):
        return self._n

    def __iter__(self):
        return (self._children[str(i)] for i in range(self._n))


class Sequential(Module):
    def __init__(self, *mods):
        super().__init__()
        object.__setattr__(self, "_n", len(mods))
        for i, m in enumerate(mods):
            self._children[str(i)] = m

    def __getitem__(self, i: int) -> Module:
        return self._children[str(i if i >= 0 else self._n + i)]

    def __len__(self):
        return self._n

    def __iter__(self):
        return (self._children[str(i)] for i in range(self._n))

    def apply(self, tree, ctx, x):
        for i in range(self._n):
            x = self._children[str(i)](self.sub(tree, i), ctx, x)
        return x


class Identity(Module):
    def apply(self, tree, ctx, x):
        return x


