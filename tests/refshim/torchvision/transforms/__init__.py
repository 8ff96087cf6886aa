
class Compose:
    def __init__(self, ts): self.ts = ts
    def __call__(self, x):
        for t in self.ts: x = t(x)
        return x
class ToTensor: pass
class Normalize:
    def __init__(self,*a,**k): pass
class ToPILImage: pass
class Lambda:
    def __init__(self, f): self.f=f
    def __call__(self, x): return self.f(x)

import enum
class InterpolationMode(enum.Enum):
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    LANCZOS = "lanczos"
    BOX = "box"
    HAMMING = "hamming"
