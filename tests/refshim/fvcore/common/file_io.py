from iopath.common.file_io import PathManager
