
def read_video(*a, **k): raise NotImplementedError
