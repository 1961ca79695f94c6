"""Stand-in for ``numba`` so the pure-Python reference at /root/reference can
be executed (slowly) to generate golden parity fixtures.

The reference uses numba only as a JIT accelerator plus typed containers; all
of its kernels are valid pure Python.  This shim maps the numba API surface
the reference touches onto plain Python / NumPy equivalents.  It lives in
tools/ and is inserted into ``sys.path`` only by the fixture generator — it is
never part of the itrails_tpu package.
"""

import numpy as np


def _identity_decorator(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def wrap(fn):
        return fn

    return wrap


jit = _identity_decorator
njit = _identity_decorator


class _NbType:
    """A numba type token that also works as a NumPy dtype (via the
    ``.dtype`` attribute protocol) and tolerates slicing/calls."""

    def __init__(self, np_dtype):
        self.dtype = np.dtype(np_dtype)

    def __getitem__(self, item):
        return self

    def __call__(self, *args, **kwargs):
        return self


class _TypesModule:
    int32 = _NbType(np.int32)
    int64 = _NbType(np.int64)
    float32 = _NbType(np.float32)
    float64 = _NbType(np.float64)
    boolean = _NbType(np.bool_)

    @staticmethod
    def Tuple(*args, **kwargs):
        return None

    @staticmethod
    def UniTuple(*args, **kwargs):
        return None

    @staticmethod
    def ListType(*args, **kwargs):
        return None


types = _TypesModule()


class _TypedDict(dict):
    @staticmethod
    def empty(*args, **kwargs):
        return _TypedDict()


class _TypedList(list):
    pass


def List(iterable=None):
    return _TypedList(iterable) if iterable is not None else _TypedList()


List.empty_list = lambda *a, **k: _TypedList()


class _TypedModule:
    Dict = _TypedDict
    List = staticmethod(List)


typed = _TypedModule()
