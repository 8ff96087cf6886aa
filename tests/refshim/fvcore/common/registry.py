
class Registry:
    def __init__(self, name): self._name=name; self._map={}
    def register(self, obj=None):
        if obj is None:
            def deco(o): self._map[o.__name__]=o; return o
            return deco
        self._map[obj.__name__]=obj; return obj
    def get(self, k): return self._map[k]
