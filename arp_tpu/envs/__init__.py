from .fake import FakeProcgen
from .procgen import Procgen
