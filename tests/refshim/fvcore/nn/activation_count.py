def activation_count(*a, **k): return {}, 0
