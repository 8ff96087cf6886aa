def imread(*a, **k): raise NotImplementedError
def imdecode(*a, **k): raise NotImplementedError
IMREAD_COLOR = 1
COLOR_BGR2RGB = 4
def cvtColor(*a, **k): raise NotImplementedError
def __getattr__(k):
    def f(*a, **kw): raise NotImplementedError
    return f
