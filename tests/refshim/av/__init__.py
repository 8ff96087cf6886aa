def open(*a, **k):
    raise NotImplementedError
logging = None
