
def box_area(boxes):
    return (boxes[:, 2]-boxes[:, 0])*(boxes[:, 3]-boxes[:, 1])
