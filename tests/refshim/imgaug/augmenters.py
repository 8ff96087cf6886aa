class _A:
    def __getattr__(self, k):
        def f(*a, **kw): raise NotImplementedError
        return f
import sys
sys.modules[__name__ + ""] = sys.modules[__name__]
