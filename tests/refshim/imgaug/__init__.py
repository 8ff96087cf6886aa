from . import augmenters
