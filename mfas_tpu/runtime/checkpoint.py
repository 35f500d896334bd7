"""PyTorch checkpoint format compatibility — no torch dependency.

The reference persists models as raw ``torch.save``d state_dicts and its
published pretrained backbones come in that format (SURVEY.md §5.4;
reference main_found_ntu.py:102-105, README.md:41). This module reads and
writes them with the stdlib only:

  * modern zip container (torch >= 1.6): ``archive/data.pkl`` pickled with
    persistent ids ``('storage', <StorageType>, key, location, numel)`` and
    per-storage raw little-endian payloads under ``archive/data/<key>``;
  * legacy stream (torch < 1.6 — the 2019 MFAS release checkpoints): magic
    number + protocol + sys_info pickles, the object pickle, the pickled
    list of storage keys, then each storage as i64 numel + raw bytes.

Tensors are rebuilt as numpy arrays from ``_rebuild_tensor_v2``'s
offset/size/stride metadata. Writing emits the modern zip container
(GLOBAL opcodes for torch symbols are written by hand so torch never has
to be importable). ``module.``-prefix stripping (DataParallel checkpoints,
reference avmnist_searchable.py:51-57) is provided as a helper.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile

import numpy as np

try:  # bfloat16 support piggybacks on jax's ml_dtypes
    import ml_dtypes
    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
    "BFloat16Storage": _BFLOAT16,
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
}

_NP_TO_STORAGE = {
    **({_BFLOAT16: "BFloat16Storage"} if _BFLOAT16 is not None else {}),
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}

MAGIC_NUMBER = 0x1950A86A20F9469CFC6C
PROTOCOL_VERSION = 1001


# --------------------------------------------------------------------------
# reading
# --------------------------------------------------------------------------
class _StorageType:
    """Stands in for torch.FloatStorage & friends during unpickling."""

    def __init__(self, name):
        self.name = name

    @property
    def dtype(self):
        dt = _STORAGE_DTYPES.get(self.name)
        if dt is None:
            raise ValueError(f"unsupported torch storage type {self.name}")
        return dt


class _Storage:
    """Mutable slot filled with the storage's 1-D numpy array."""

    __slots__ = ("data",)

    def __init__(self, data=None):
        self.data = data


class _DeferredTensor:
    """Tensor metadata captured during unpickling; materialized once the
    storage bytes are available (legacy format reads them after the object
    pickle)."""

    def __init__(self, storage, offset, size, stride):
        self.storage, self.offset = storage, offset
        self.size, self.stride = tuple(size), tuple(stride)

    def materialize(self):
        data = self.storage.data
        if len(self.size) == 0:
            return data[self.offset].copy()
        itemsize = data.dtype.itemsize
        strides_bytes = tuple(s * itemsize for s in self.stride)
        view = np.lib.stride_tricks.as_strided(
            data[self.offset:], shape=self.size, strides=strides_bytes)
        return np.ascontiguousarray(view)


def _materialize(obj):
    if isinstance(obj, _DeferredTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        return type(obj)((k, _materialize(v)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v) for v in obj)
    return obj


class _Unpickler(pickle.Unpickler):
    def __init__(self, f, loader):
        super().__init__(f, encoding="latin1")
        self._loader = loader

    def find_class(self, module, name):
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "torch._utils" and name in ("_rebuild_tensor_v2",
                                                 "_rebuild_tensor"):
            return lambda storage, offset, size, stride, *a, **k: \
                _DeferredTensor(storage, offset, size, stride)
        if module == "torch._utils" and name == "_rebuild_parameter":
            return lambda tensor, *a, **k: tensor
        if module == "torch" and name == "Size":
            return tuple
        if module in ("collections", "builtins", "__builtin__", "copyreg",
                      "numpy", "numpy.core.multiarray", "numpy._core.multiarray"):
            return super().find_class(module, name)
        if module.startswith("torch"):
            return lambda *a, **k: None  # inert stub for exotic symbols
        # anything else is REFUSED: checkpoints are untrusted third-party
        # files (the published MFAS backbones), and the default pickle
        # find_class would import and execute arbitrary module globals
        # (e.g. os.system) during load
        raise pickle.UnpicklingError(
            f"checkpoint references disallowed global {module}.{name} — "
            "only torch tensor/storage rebuilds, collections, numpy array "
            "reconstructors, and builtins are allowed")

    def persistent_load(self, pid):
        if pid[0] != "storage":
            raise ValueError(f"unknown persistent id {pid[0]!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        if len(pid) > 5 and pid[5]:
            # legacy (torch<1.6) storage VIEWS: pid[5] = (view_key, offset,
            # numel) means the tensor's storage is a slice of the root and
            # its storage_offset is relative to that slice — rebuilding
            # against the root would silently shift every value. None in
            # every checkpoint this framework targets (state_dicts of
            # independent parameters); refuse loudly rather than corrupt.
            raise NotImplementedError(
                "legacy checkpoint uses storage views (view_metadata="
                f"{pid[5]!r}); re-save it with a modern torch to flatten")
        return self._loader(storage_type, str(key), int(numel))


def load(path_or_file):
    """torch.load equivalent -> python object with numpy arrays for tensors."""
    if hasattr(path_or_file, "read"):
        # stream source: buffer once (both sniff and parse need it)
        data = path_or_file.read()
        if zipfile.is_zipfile(io.BytesIO(data)):
            return _load_zip(io.BytesIO(data))
        return _load_legacy(io.BytesIO(data))
    # path source: let zipfile read the file directly — no whole-file
    # buffer, so multi-GB backbone checkpoints don't double peak memory
    if zipfile.is_zipfile(path_or_file):
        with open(path_or_file, "rb") as f:
            return _load_zip(f)
    # _load_legacy reads strictly sequentially — stream the file directly
    with open(path_or_file, "rb") as f:
        return _load_legacy(f)


def _load_zip(f):
    zf = zipfile.ZipFile(f)
    names = zf.namelist()
    prefix = names[0].split("/", 1)[0]
    pkl = zf.read(f"{prefix}/data.pkl")

    cache = {}

    def loader(storage_type, key, numel):
        if key not in cache:
            raw = zf.read(f"{prefix}/data/{key}")
            cache[key] = _Storage(
                np.frombuffer(raw, storage_type.dtype, count=numel).copy())
        return cache[key]

    obj = _Unpickler(io.BytesIO(pkl), loader).load()
    return _materialize(obj)


def _load_legacy(f):
    magic = pickle.load(f)
    if magic != MAGIC_NUMBER:
        raise ValueError("not a torch checkpoint (bad magic number)")
    protocol = pickle.load(f)
    if protocol != PROTOCOL_VERSION:
        raise ValueError(f"unsupported torch legacy protocol {protocol}")
    _sys_info = pickle.load(f)

    storages, dtypes = {}, {}

    def loader(storage_type, key, numel):
        if key not in storages:
            storages[key] = _Storage()
            dtypes[key] = storage_type.dtype
        return storages[key]

    obj = _Unpickler(f, loader).load()

    keys = pickle.load(f)
    for key in keys:
        key = str(key)
        dt = dtypes[key]
        (numel,) = struct.unpack("<q", f.read(8))
        raw = f.read(numel * dt.itemsize)
        storages[key].data = np.frombuffer(raw, dt, count=numel).copy()

    return _materialize(obj)


# --------------------------------------------------------------------------
# writing (modern zip container)
# --------------------------------------------------------------------------
class _Global:
    """A torch global emitted as a raw GLOBAL opcode (torch need not be
    importable at write time)."""

    def __init__(self, module, name):
        self.module, self.name = module, name

    def __call__(self, *a, **k):  # satisfies save_reduce's callable check
        raise RuntimeError("_Global is write-only")


class _PersistentStorage:
    def __init__(self, array, key):
        self.array, self.key = array, key


class _WTensor:
    def __init__(self, array, key):
        self.array = array
        self.key = key

    def __reduce__(self):
        from collections import OrderedDict
        size = tuple(self.array.shape)
        stride = tuple(s // self.array.itemsize for s in self.array.strides)
        return (_Global("torch._utils", "_rebuild_tensor_v2"),
                (_PersistentStorage(self.array, self.key), 0, size, stride,
                 False, OrderedDict()))


class _WriterPickler(pickle._Pickler):
    # the pure-python pickler is required: the C pickler ignores a
    # subclass's ``save`` override, and we need it to emit raw GLOBAL
    # opcodes for torch symbols
    def save(self, obj, save_persistent_id=True):  # noqa: D401
        if isinstance(obj, _Global):
            self.write(pickle.GLOBAL
                       + obj.module.encode("ascii") + b"\n"
                       + obj.name.encode("ascii") + b"\n")
            self.memoize(obj)
            return
        super().save(obj, save_persistent_id)

    def persistent_id(self, obj):
        if isinstance(obj, _PersistentStorage):
            storage_name = _NP_TO_STORAGE.get(obj.array.dtype)
            if storage_name is None:
                raise ValueError(f"cannot write dtype {obj.array.dtype}")
            return ("storage", _Global("torch", storage_name), obj.key,
                    "cpu", int(obj.array.size))
        return None


def _wrap_tensors(obj, counter, store, memo=None):
    # numpy SCALARS first: they carry .dtype/.shape, so the tensor branch
    # below would otherwise serialize them as 0-d tensors that torch.load
    # yields back as tensor(3) where callers expect a python int
    if memo is None:
        memo = {}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.bool_):
        return bool(obj)
    if isinstance(obj, np.ndarray) or (hasattr(obj, "dtype")
                                       and hasattr(obj, "shape")):
        # dedup by object identity, like torch.save's storage memo: tied
        # weights (two tree paths referencing one array) share one storage
        # key, so the tie survives a round-trip and the bytes are written
        # once. (The caller's tree keeps obj alive, so ids stay unique.)
        if id(obj) in memo:
            return memo[id(obj)]
        arr = np.asarray(obj)
        if arr.ndim == 0 and arr.dtype == np.dtype("int32"):
            arr = arr.astype(np.int64)  # torch counters are int64
        if arr.ndim > 0:  # ascontiguousarray would promote 0-d to (1,)
            arr = np.ascontiguousarray(arr)
        key = str(counter[0])
        counter[0] += 1
        store[key] = arr
        memo[id(obj)] = wt = _WTensor(arr, key)
        return wt
    if isinstance(obj, dict):
        return type(obj)((k, _wrap_tensors(v, counter, store, memo))
                         for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(_wrap_tensors(v, counter, store, memo)
                         for v in obj)
    return obj


def save(obj, path):
    """torch.save equivalent (modern zip container, torch.load-readable).
    numpy/jax arrays become torch tensors of the matching dtype."""
    counter = [0]
    store: dict = {}
    wrapped = _wrap_tensors(obj, counter, store)

    buf = io.BytesIO()
    _WriterPickler(buf, protocol=2).dump(wrapped)

    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
        zf.writestr("archive/byteorder", "little")
        for key, arr in store.items():
            zf.writestr(f"archive/data/{key}", arr.tobytes())


# --------------------------------------------------------------------------
# state_dict <-> framework tree helpers
# --------------------------------------------------------------------------
def strip_module_prefix(flat: dict) -> dict:
    """Remove DataParallel's 'module.' prefix (avmnist_searchable.py:51-57)."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in flat.items()}


def load_state_dict(path) -> dict:
    """Load a checkpoint as a flat {dotted.path: np.ndarray} dict. The
    common {'state_dict': {...}, 'epoch': N, ...} training-wrapper layout
    is unwrapped; other non-tensor values fail loudly instead of becoming
    0-d object arrays."""
    obj = load(path)
    if not isinstance(obj, dict):
        raise ValueError("checkpoint does not contain a state_dict")
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    bad = [k for k, v in obj.items()
           if not isinstance(v, (np.ndarray, np.generic, int, float, bool))]
    if bad:
        raise ValueError(
            f"checkpoint entries are not tensors: {bad[:5]} — not a "
            "state_dict (wrapper layouts other than 'state_dict' are not "
            "auto-unwrapped)")
    return strip_module_prefix({str(k): np.asarray(v) for k, v in obj.items()})


def tree_from_state_dict(flat: dict, template=None):
    """Flat state_dict -> nested framework tree (optionally validated and
    dtype-aligned against a template tree from Module.init)."""
    from mfas_tpu.core.module import flatten_tree, unflatten_tree
    import jax.numpy as jnp

    if template is not None:
        tflat = flatten_tree(template)
        missing = [k for k in tflat if k not in flat]
        unexpected = [k for k in flat if k not in tflat]
        if missing or unexpected:
            raise KeyError(
                f"state_dict mismatch: missing={missing[:5]} "
                f"unexpected={unexpected[:5]}")
        # .dtype reads metadata only — np.asarray(template_leaf) would
        # fetch every device-resident template array to host just for its
        # dtype (tens of MB over a tunneled backend)
        out = {k: jnp.asarray(np.asarray(flat[k]),
                              dtype=getattr(tflat[k], "dtype", None)
                              or np.asarray(tflat[k]).dtype)
               for k in tflat}
        return unflatten_tree(out)
    return unflatten_tree({k: jnp.asarray(v) for k, v in flat.items()})


def state_dict_from_tree(tree) -> dict:
    from mfas_tpu.core.module import flatten_tree
    return {k: np.asarray(v) for k, v in flatten_tree(tree).items()}
