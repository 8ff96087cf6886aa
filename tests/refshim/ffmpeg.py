def input(*a, **k): raise NotImplementedError
