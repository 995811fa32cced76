"""Model zoo: BLSTM trunk + DPCL / L41 / Chimera heads + adaptive front-end.

Parity map (SURVEY.md §2.2-2.3): models/adapt.py ~ reference models/adapt.py
(learned filterbank), models/dpcl.py ~ reference models/dpcl.py, models/l41.py
~ reference models/L41.py, models/chimera.py ~ the driver-mandated Chimera
config (BASELINE.json:10).  All models are pure-functional: params are plain
dict pytrees with top-level keys ``front`` / ``separator`` / ``back`` so
scope-filtered partial restore (SURVEY.md §5.4) is a dict operation.
"""

from amss_tpu.models.blstm import init_blstm_stack, blstm_stack
from amss_tpu.models.dpcl import DPCLModel
from amss_tpu.models.l41 import L41Model
from amss_tpu.models.chimera import ChimeraModel
from amss_tpu.models.adapt import AdaptFrontEnd
