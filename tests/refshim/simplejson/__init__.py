"""simplejson shim -> stdlib json (strips simplejson-only kwargs)."""
import json as _json
from json import *  # noqa: F401,F403

_SIMPLEJSON_ONLY = {"use_decimal", "namedtuple_as_object", "tuple_as_array",
                    "ignore_nan", "iterable_as_array"}


def dumps(*a, **kw):
    for k in _SIMPLEJSON_ONLY:
        kw.pop(k, None)
    return _json.dumps(*a, **kw)


def loads(*a, **kw):
    for k in _SIMPLEJSON_ONLY:
        kw.pop(k, None)
    return _json.loads(*a, **kw)
