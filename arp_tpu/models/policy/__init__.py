from .models import ARPDT, BC, GCBC, EnsembleHeads, get_policy_default_config
