from .bilevel import (  # noqa: F401
    SearchState,
    Searcher,
    make_search_step,
    make_search_step_unrolled,
    make_warmup_step,
)
