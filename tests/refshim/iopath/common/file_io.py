
class PathManager:
    @staticmethod
    def open(path, mode='r', **kw): return open(path, mode, **kw)
    @staticmethod
    def exists(path): import os; return os.path.exists(path)
    @staticmethod
    def ls(path): import os; return os.listdir(path)
    @staticmethod
    def mkdirs(path): import os; os.makedirs(path, exist_ok=True)
    @staticmethod
    def rm(path): import os; os.remove(path)
    @staticmethod
    def copy(a,b): import shutil; shutil.copy(a,b)
    def register_handler(self, *a, **k): pass
class PathManagerFactory:
    @staticmethod
    def get(key=None): return PathManager()

g_pathmgr = PathManager()
