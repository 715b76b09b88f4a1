"""Pure-Python reader for PyTorch ``.pt``/``.pth`` checkpoint files.

Parses torch's serialization formats directly (zipfile + pickle + raw
little-endian storages) and returns numpy arrays — no torch import required.
This is what makes the framework checkpoint-compatible with the reference's
artifacts (``pretrained_ckpt/{imagenet-F,fewsol-198-F}/*.pt``, the ``_v/_t/_a``
training triples written by ``main.py:350-369``, and OpenAI CLIP state-dict
releases) on machines where torch is not installed.

Supported formats:

- **zip format** (torch >= 1.6): archive containing ``<name>/data.pkl`` and
  raw storage blobs under ``<name>/data/<key>``.
- **legacy format** (torch < 1.6): magic-number pickle stream followed by raw
  storages.
- **TorchScript archives** (e.g. OpenAI CLIP releases): detected by
  ``constants.pkl``.  The archive's ``data.pkl`` serializes the ScriptModule
  attribute tree — ``__torch__.*`` class instances whose state dicts map
  attribute names to tensors (standard storage persistent-ids into
  ``data/<key>`` blobs) and child modules.  The tree is walked torch-free
  into a flat ``name.path -> array`` state dict, matching what the reference
  consumes via ``model.state_dict()`` after ``torch.jit.load``
  (``clip/clip.py:92-136``).

bfloat16/fp16 storages decode to ``ml_dtypes.bfloat16`` / ``np.float16``.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, BinaryIO, Dict

import numpy as np

try:
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover - ml_dtypes ships with jax
    _BFLOAT16 = None

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C
_LEGACY_PROTOCOL = 1001

# torch storage class name -> numpy dtype
_STORAGE_DTYPES: Dict[str, Any] = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "ComplexFloatStorage": np.complex64,
    "ComplexDoubleStorage": np.complex128,
}
# torch.<dtype> objects appearing as UntypedStorage companions
_DTYPE_NAMES: Dict[str, Any] = {
    "float32": np.float32,
    "float64": np.float64,
    "float16": np.float16,
    "int64": np.int64,
    "int32": np.int32,
    "int16": np.int16,
    "int8": np.int8,
    "uint8": np.uint8,
    "bool": np.bool_,
    "complex64": np.complex64,
    "complex128": np.complex128,
}


class _StorageRef:
    """Lazy handle to a raw storage blob inside the archive."""

    __slots__ = ("key", "dtype", "numel", "loader", "_raw")

    def __init__(self, key: str, dtype, numel: int, loader):
        self.key = key
        self.dtype = dtype
        self.numel = numel
        self.loader = loader
        self._raw = None  # legacy format: raw bytes attached after unpickling

    def to_numpy(self) -> np.ndarray:
        raw = self.loader(self.key)
        if self.dtype == "bfloat16":
            if _BFLOAT16 is None:
                raise RuntimeError("bfloat16 checkpoint requires ml_dtypes")
            return np.frombuffer(raw, dtype=_BFLOAT16)
        return np.frombuffer(raw, dtype=self.dtype)


class _InlineStorage:
    """Storage decoded from an embedded legacy torch.save byte blob.

    Raw ``pickle.dump``'d tensors (not ``torch.save``) serialize each storage
    through ``torch.storage._load_from_bytes(b)`` where ``b`` is a complete
    legacy-format stream; the legacy reader below turns it into an array.
    """

    __slots__ = ("arr",)

    def __init__(self, arr: np.ndarray):
        self.arr = arr

    def to_numpy(self) -> np.ndarray:
        return self.arr


class _ScriptObject:
    """Generic stand-in for any ``__torch__.*`` TorchScript class.

    TS ``data.pkl`` instantiates script classes via NEWOBJ with no args and
    fills state via BUILD with an attribute dict; one permissive Python class
    covers them all since only the attribute tree matters here.
    """

    def __init__(self, *args, **kwargs):  # some emitters use REDUCE
        pass


class _TorchDtypeMarker:
    def __init__(self, name: str):
        self.name = name


class _StorageTypeMarker:
    """Stand-in for torch.FloatStorage & co. encountered by the unpickler."""

    def __init__(self, dtype):
        self.dtype = dtype


class _PendingTensor:
    """Tensor whose storage bytes have not been read yet (legacy format)."""

    __slots__ = ("storage", "storage_offset", "size", "stride")

    def __init__(self, storage, storage_offset, size, stride):
        self.storage = storage
        self.storage_offset = storage_offset
        self.size = size
        self.stride = stride

    def resolve(self) -> np.ndarray:
        return _rebuild_tensor(self.storage, self.storage_offset, self.size, self.stride)


def _rebuild_tensor(storage: _StorageRef, storage_offset, size, stride):
    try:
        flat = storage.to_numpy()
    except KeyError:
        # Legacy format: raw bytes follow the pickle payload; defer.
        return _PendingTensor(storage, storage_offset, size, stride)
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if not size:
        return flat[int(storage_offset)].copy()
    itemsize = flat.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        flat[int(storage_offset) :],
        shape=size,
        strides=tuple(s * itemsize for s in stride),
        writeable=False,
    )
    return np.array(view)  # materialize contiguously


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    return _rebuild_tensor(storage, storage_offset, size, stride)


def _rebuild_tensor_v3(storage, storage_offset, size, stride, requires_grad,
                       backward_hooks, dtype_marker, metadata=None):
    # Newer torch stores UntypedStorage + explicit dtype.
    if isinstance(dtype_marker, _TorchDtypeMarker):
        name = dtype_marker.name
        if name == "bfloat16":
            storage = _StorageRef(storage.key, "bfloat16", storage.numel, storage.loader)
        else:
            if name not in _DTYPE_NAMES:
                # Guessing an itemsize would decode the bytes as garbage;
                # fail loudly like the other unsupported-symbol paths.
                raise ValueError(f"unsupported torch tensor dtype {name!r}")
            storage = _StorageRef(
                storage.key, _DTYPE_NAMES[name], storage.numel, storage.loader
            )
    return _rebuild_tensor(storage, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


def _identity_rebuild(*args):
    # _rebuild_wrapper_subclass / device-tensor wrappers: first arg is data.
    return args[0]


class _Unpickler(pickle.Unpickler):
    """Unpickler that resolves torch symbols to numpy-producing shims."""

    def __init__(self, fh: BinaryIO, storage_loader):
        super().__init__(fh, encoding="utf-8")
        self._storage_loader = storage_loader

    def find_class(self, module: str, name: str):  # noqa: D102
        if module == "__torch__" or module.startswith("__torch__."):
            return _ScriptObject
        if module == "torch.jit._pickle":
            # list/dict constants in TS attribute trees
            if name in (
                "build_intlist", "build_doublelist", "build_boollist",
                "build_tensorlist", "build_strlist",
            ):
                return lambda data: data
            if name == "restore_type_tag":
                return lambda value, type_str: value
        if module.startswith("torch"):
            if name in _STORAGE_DTYPES:
                return _StorageTypeMarker(_STORAGE_DTYPES[name])
            if name in ("UntypedStorage", "TypedStorage", "_UntypedStorage"):
                return _StorageTypeMarker(np.uint8)
            if name == "BFloat16Storage":
                return _StorageTypeMarker("bfloat16")
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_tensor_v3":
                return _rebuild_tensor_v3
            if name == "_rebuild_tensor":
                return _rebuild_tensor
            if name == "_rebuild_parameter":
                return _rebuild_parameter
            if name == "_load_from_bytes":
                return _load_from_bytes
            if name in ("_rebuild_parameter_with_state", "_rebuild_wrapper_subclass"):
                return _identity_rebuild
            if module == "torch" and name in _DTYPE_NAMES or name == "bfloat16":
                return _TorchDtypeMarker(name)
            if name == "Size":
                return tuple
            if name == "device":
                return lambda *a, **k: "cpu"
            if name == "serialization" or name == "_get_layout":
                return lambda *a, **k: None
            raise pickle.UnpicklingError(
                f"Unsupported torch symbol in checkpoint: {module}.{name}"
            )
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module == "numpy" or module.startswith(("numpy.core", "numpy._core")):
            # data-only numpy reconstruction symbols (no arbitrary callables)
            if name in ("_reconstruct", "ndarray", "dtype", "scalar", "_frombuffer"):
                import importlib

                return getattr(importlib.import_module(module), name)
        if module == "builtins":
            # containers/scalars only — never exec/eval/getattr/open/...
            if name in (
                "list", "tuple", "dict", "set", "frozenset", "int", "float",
                "complex", "bool", "str", "bytes", "bytearray", "slice", "range",
            ):
                import builtins

                return getattr(builtins, name)
        if module == "argparse" and name == "Namespace":
            import argparse

            return argparse.Namespace
        raise pickle.UnpicklingError(
            f"Refusing to unpickle untrusted symbol {module}.{name}"
        )

    def persistent_load(self, pid):  # noqa: D102
        # pid = ('storage', StorageType, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"Unexpected persistent id {pid!r}")
        # 5-tuple classically, with an optional 6th view_metadata element
        # (view_key, offset, view_size) for storages that are VIEWS of
        # another storage.  Decoding a view as its root would silently
        # materialize tensors from the wrong bytes — fail loudly instead
        # (no real-world CLIP/Proto-CLIP artifact uses legacy views).
        if len(pid) > 5 and pid[5] is not None:
            raise pickle.UnpicklingError(
                "legacy checkpoint uses storage views (view_metadata="
                f"{pid[5]!r}), which this reader does not support"
            )
        _, storage_type, key, _location, numel = pid[:5]
        dtype = (
            storage_type.dtype
            if isinstance(storage_type, _StorageTypeMarker)
            else np.float32
        )
        return _StorageRef(str(key), dtype, int(numel), self._storage_loader)


# --------------------------------------------------------------------------
# zip format (torch >= 1.6)
# --------------------------------------------------------------------------

def _load_zip(zf: zipfile.ZipFile) -> Any:
    names = zf.namelist()
    pkl_name = next((n for n in names if n.endswith("/data.pkl") or n == "data.pkl"), None)
    if pkl_name is None:
        raise ValueError("zip archive has no data.pkl")
    prefix = pkl_name[: -len("data.pkl")]

    def loader(key: str) -> bytes:
        try:
            return zf.read(f"{prefix}data/{key}")
        except KeyError as exc:
            # Raise a non-KeyError so _rebuild_tensor doesn't mistake a
            # truncated/corrupt archive for the legacy deferred-bytes case
            # and return silent _PendingTensor sentinels.
            raise ValueError(
                f"zip checkpoint is missing storage blob {key!r}"
            ) from exc

    with zf.open(pkl_name) as fh:
        result = _Unpickler(io.BufferedReader(fh), loader).load()
    if isinstance(result, _ScriptObject):
        # TorchScript archive: data.pkl holds the root ScriptModule; flatten
        # its attribute tree into the state dict torch.jit users would get.
        return _flatten_script_module(result)
    return result


# non-state attributes TS serializes on every module
_SCRIPT_META_ATTRS = frozenset(
    {"training", "_is_full_backward_hook", "_non_persistent_buffers_set"}
)


def _flatten_script_module(obj: _ScriptObject, prefix: str = "") -> Dict[str, Any]:
    """Walk a TS module tree into ``{dotted.name: array}``.

    Tensor-valued attributes (parameters, buffers, and plain tensor attrs
    like CLIP's ``attn_mask``) keep their dotted path; scalar/typed attrs
    (ints, strs, lists) are dropped, matching ``state_dict()`` consumption in
    the reference loader (``clip/clip.py:133``; shape-only config inference
    at ``clip/model.py:397-434``).
    """
    out: Dict[str, Any] = {}
    for name, val in vars(obj).items():
        if name in _SCRIPT_META_ATTRS:
            continue
        key = f"{prefix}{name}"
        if isinstance(val, _ScriptObject):
            out.update(_flatten_script_module(val, key + "."))
        elif isinstance(val, (np.ndarray, np.generic, _PendingTensor, _StorageRef)):
            out[key] = val
    return out


# --------------------------------------------------------------------------
# legacy format (torch < 1.6)
# --------------------------------------------------------------------------

class _PrimitiveUnpickler(pickle.Unpickler):
    """For the legacy preamble/trailer streams (magic, protocol, sys_info,
    key order): pure primitives only.  Any GLOBAL opcode — the vector for
    arbitrary code execution — is rejected outright, upholding the module's
    'untrusted callables never execute' contract on every stream."""

    def find_class(self, module, name):  # noqa: D102
        raise pickle.UnpicklingError(
            f"legacy torch preamble must contain only primitives, "
            f"got {module}.{name}"
        )


def _load_primitive(fh: BinaryIO) -> Any:
    return _PrimitiveUnpickler(fh).load()


def _load_legacy(fh: BinaryIO) -> Any:
    magic = _load_primitive(fh)
    if magic != _LEGACY_MAGIC:
        raise ValueError("not a legacy torch file")
    protocol = _load_primitive(fh)
    if protocol != _LEGACY_PROTOCOL:
        raise ValueError(f"unsupported legacy protocol {protocol}")
    _sys_info = _load_primitive(fh)

    storages: Dict[str, _StorageRef] = {}

    def loader(key: str) -> bytes:
        return storages[key]._raw  # type: ignore[attr-defined]

    unpickler = _Unpickler(fh, loader)
    result = unpickler.load()

    # Deserialize raw storages that follow the pickle payload.
    key_order = _load_primitive(fh)
    refs = _collect_storage_refs(result)
    by_key = {r.key: r for r in refs}
    for key in key_order:
        (numel,) = struct.unpack("<q", fh.read(8))
        ref = by_key.get(str(key))
        if ref is None:
            # A blob with no referencing tensor: its itemsize is unknowable,
            # so any guess would desynchronize every subsequent storage in
            # the stream. Fail loudly instead of corrupting the rest.
            raise ValueError(
                f"legacy torch stream lists storage {key!r} that no tensor "
                "references; cannot determine its byte length"
            )
        itemsize = 2 if ref.dtype in (np.float16, "bfloat16") else np.dtype(ref.dtype).itemsize
        raw = fh.read(numel * itemsize)
        ref._raw = raw  # type: ignore[attr-defined]
        storages[ref.key] = ref

    return _materialize(result)


def _collect_storage_refs(obj: Any) -> list:
    out = []
    seen = set()

    def walk(o):
        if id(o) in seen:
            return
        seen.add(id(o))
        if isinstance(o, _StorageRef):
            out.append(o)
        elif isinstance(o, _PendingTensor):
            walk(o.storage)
        elif isinstance(o, dict):
            for v in o.values():
                walk(v)
        elif isinstance(o, (list, tuple, set, frozenset)):
            for v in o:
                walk(v)
        elif hasattr(o, "__dict__") and type(o).__module__ == "argparse":
            # find_class admits argparse.Namespace; tensors can hide in it
            for v in vars(o).values():
                walk(v)

    walk(obj)
    return out


def _materialize(obj: Any) -> Any:
    # Legacy tensors were rebuilt before raw bytes were read; re-walk to turn
    # any leftover storage refs into arrays.
    if isinstance(obj, _PendingTensor):
        return obj.resolve()
    if isinstance(obj, _StorageRef):
        return obj.to_numpy()
    if isinstance(obj, dict):
        return type(obj)((k, _materialize(v)) for k, v in obj.items())
    if isinstance(obj, list):
        return [_materialize(v) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_materialize(v) for v in obj)
    if hasattr(obj, "__dict__") and type(obj).__module__ == "argparse":
        for k, v in vars(obj).items():
            setattr(obj, k, _materialize(v))
        return obj
    return obj


def _load_from_bytes(b: bytes) -> _InlineStorage:
    """Shim for ``torch.storage._load_from_bytes`` (raw-pickled tensors)."""
    arr = _load_legacy(io.BytesIO(b))
    return _InlineStorage(np.asarray(arr))


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def load_pkl(path: str) -> Any:
    """Load a reference ``pickle.dump``'d artifact into numpy containers.

    The reference pickles its textual memory bank (a torch CUDA tensor,
    ``utils.py:36-69``) and its HP-search grids (numpy ``(341, 3)`` arrays of
    ``[alpha, beta, acc]`` rows, ``main.py:155-211``) with the plain pickle
    module rather than ``torch.save``.  Raw-pickled tensors embed each
    storage as a legacy torch.save byte stream, decoded by the legacy
    reader; every symbol resolves through the same restricted allowlist as
    :func:`load_pt`, so untrusted callables never execute.
    """

    def loader(key: str) -> bytes:
        raise KeyError(key)

    with open(path, "rb") as fh:
        return _plainify(_materialize(_Unpickler(fh, loader).load()))


def load_pt(path: str) -> Any:
    """Load a torch checkpoint into numpy containers.

    Tensors become ``np.ndarray`` (fp16 stays fp16; bf16 becomes
    ``ml_dtypes.bfloat16``).  ``state_dict``-style OrderedDicts come back as
    plain dicts of arrays.  Accepts all four artifact shapes: zip archives
    (torch >= 1.6 and TorchScript), the legacy pre-1.6 stream, and — when
    the file is neither — a plain ``pickle.dump``'d container (e.g. a
    numpy state dict), decoded through the same restricted unpickler.
    """
    with open(path, "rb") as fh:
        head = fh.read(4)
    if head[:2] == b"PK":
        with zipfile.ZipFile(path) as zf:
            result = _load_zip(zf)
        return _plainify(result)
    with open(path, "rb") as fh:
        try:  # legacy sniff: the stream must OPEN with the pickled magic
            is_legacy = _load_primitive(fh) == _LEGACY_MAGIC
        except Exception:  # noqa: BLE001 — any non-primitive preamble
            is_legacy = False
    if is_legacy:
        with open(path, "rb") as fh:
            return _plainify(_load_legacy(fh))
    return load_pkl(path)


def _plainify(obj: Any) -> Any:
    import collections

    if isinstance(obj, collections.OrderedDict):
        return {k: _plainify(v) for k, v in obj.items()}
    if isinstance(obj, dict):
        return {k: _plainify(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_plainify(v) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_plainify(v) for v in obj)
    return obj
