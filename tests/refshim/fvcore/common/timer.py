
import time
class Timer:
    def __init__(self): self.reset()
    def reset(self): self._start=time.perf_counter(); self._paused=None; self._total=0.0
    def pause(self): self._paused=time.perf_counter()
    def resume(self):
        if self._paused is not None:
            self._total -= time.perf_counter()-self._paused; self._paused=None
        self._start=time.perf_counter()
    def seconds(self): return time.perf_counter()-self._start+self._total
