from .models import (
    ARPDT,
    BC,
    GCBC,
    EnsembleHeads,
    build_frozen_qpack,
    get_policy_default_config,
)
