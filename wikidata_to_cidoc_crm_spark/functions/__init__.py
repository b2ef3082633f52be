from .uris import (  # noqa: F401
    mint,
    pair_key,
    qid_from_uri,
    timespan_uri,
    wd_entity_uri,
)
from .dates import date_only, year_of  # noqa: F401
