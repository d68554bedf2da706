from .recorder import TrajectoryRecorder, filter_condition
