"""Importable stream fetcher fixture (streaming data sources resolve
fetchers by module path on executors, so it must be importable — not a
closure)."""

from __future__ import annotations


def stream_posts_feed(poll: int) -> list[dict]:
    return [
        {
            "id": poll * 3 + i,
            "date_gmt": f"2022-01-0{(poll % 8) + 1}T0{i}:00:00",
            "content": f"streamed post body {poll * 3 + i}",
        }
        for i in range(3)
    ]
