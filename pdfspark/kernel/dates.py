"""PDF date strings (reference: `src/date.rs:5-137`).

``D:YYYYMMDDHHmmSS(Z/+/-HH'mm')`` — every field after the year optional.
Returned as a dict of optional ints (+ ``ut``: '=', '+', '-'), convertible
to a timestamp when we surface document metadata columns.
"""

from __future__ import annotations

import re
from typing import Optional

_DATE_RE = re.compile(
    r"^D:(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?"
    r"([Zz+\-])?'?(?:(\d{2})')?(?:(\d{2})'?)?$"
)


def parse_pdf_date(s) -> Optional[dict]:
    if isinstance(s, bytes):
        s = s.decode("latin-1", "replace")
    if not isinstance(s, str):
        return None
    m = _DATE_RE.match(s.strip())
    if not m:
        return None
    year, month, day, hour, minute, second, ut, uth, utm = m.groups()
    return {
        "year": int(year) if year else None,
        "month": int(month) if month else None,
        "day": int(day) if day else None,
        "hour": int(hour) if hour else None,
        "minute": int(minute) if minute else None,
        "second": int(second) if second else None,
        "ut": {"Z": "=", "z": "="}.get(ut, ut) if ut else None,
        "ut_hour": int(uth) if uth else None,
        "ut_minute": int(utm) if utm else None,
    }
