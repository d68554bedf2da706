from .engine import ClipRewardEngine
