"""Code construction: base graphs, QC lifting, layout compiler (L0)."""

from tpu_ldpc.codes.base_graphs import (  # noqa: F401
    FAMILY_LIFTS,
    ace8_cost,
    count_4cycles,
    count_6cycles,
    count_8cycles,
    count_8cycles_raw,
    family_base_graph,
    girth_lower_bound,
    judged_base_graph,
    make_base_graph,
    make_sc_base_graph,
    select_shifts,
)
from tpu_ldpc.codes.code import LdpcCode  # noqa: F401
from tpu_ldpc.codes.expand import expand, rotate  # noqa: F401
from tpu_ldpc.codes.nrlike import (  # noqa: F401
    make_nrlike_base_graph,
    nrlike_adapt,
    nrlike_code,
)
