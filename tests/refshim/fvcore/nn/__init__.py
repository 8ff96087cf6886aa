
def flop_count_table(*a, **k): return ''
class FlopCountAnalysis:
    def __init__(self,*a,**k): pass
    def total(self): return 0
def activation_count(*a, **k): return {}, 0
def flop_count(*a, **k): return {}, 0
def parameter_count(m): return {'': sum(p.numel() for p in m.parameters())}
