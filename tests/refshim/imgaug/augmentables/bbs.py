class BoundingBox:
    def __init__(self, x1=0, y1=0, x2=0, y2=0, label=None):
        self.x1, self.y1, self.x2, self.y2, self.label = x1, y1, x2, y2, label
class BoundingBoxesOnImage:
    def __init__(self, bbs, shape=None):
        self.bounding_boxes = bbs; self.shape = shape
