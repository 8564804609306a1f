from . import (
    compaction, datetime, elementwise, groupby as groupby_mod, hashing,
    join as join_mod, quantiles, reductions, scan, sort, window,
)

from .elementwise import (
    add, sub, mul, div, floordiv, gt, ge, lt, le, eq, ne,
    bitwise_and, bitwise_or, bitwise_xor,
    sin, cos, tan, asin, acos, atan, exp, log, sqrt, ceil, floor,
    cast, unary_op, binary_op, compare, compare_scalar,
)
from .reductions import reduce, sum, min, max, product, sum_of_squares
from .scan import prefixsum
from .compaction import apply_stencil, filter_table
from .hashing import (
    murmur3_32, fnv1a_64_columns, hash_combine, hash_columns,
    hash_table_rows, hash_partition, partition_ids, partition_sizes,
)
from .sort import (
    order_by, sort_table, radixsort, segmented_radixsort, radix_encode,
)
from .datetime import (
    extract_year, extract_month, extract_day,
    extract_hour, extract_minute, extract_second,
)
from .join import (
    join, join_indices, inner_join, left_join, full_join, lex_searchsorted,
)
from .groupby import (
    groupby, count_distinct_keys, group_by_sum, group_by_min, group_by_max,
    group_by_avg, group_by_count,
)
from .quantiles import quantile_exact, quantile_approx
from .window import window_function
