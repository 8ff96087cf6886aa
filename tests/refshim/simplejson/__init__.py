from json import *
from json import dumps, loads
