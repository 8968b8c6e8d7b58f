"""Push delivery — the Spark-native ``schedule_events`` (A10).

Reference dataflow (/root/reference/extensions.sql:29-57, SURVEY.md §2.7):
pg_cron wakes every ``v_schedule`` → ``stream_events(view, 1)`` claims one
event → ``net.http_post`` sends ``{view, decider_id, offset, data}`` to the
edge-function URL → the lease expires unless the edge function calls
``ack_event`` back.  T8/T9/T10 (/root/reference/extensions.sql:61-126)
create/re-schedule/remove the cron job when a view row changes.

Spark mapping: one named StreamingQuery per view.  A rate source provides
the clock tick (``Trigger.ProcessingTime(pooling_delay_s)`` ⇔ the cron
schedule); ``foreachBatch`` runs the claim→POST step against the store's
current snapshot.  ``cron.schedule/unschedule`` ⇔ query start/stop; the
query NAME is the view name, exactly like the reference's job naming.

Faithful detail: the service never acks — at-least-once delivery relies on
the consumer acking, else lease expiry redelivers (README.md:135).
"""

from __future__ import annotations

import json
import urllib.request
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from fstore_sql_spark.store import EventStore


def http_post(url: str, payload: dict) -> int:
    """Default transport (pg_net analogue).  Returns the HTTP status."""
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as resp:  # noqa: S310
        return resp.status


class PushDelivery:
    """Manages one push StreamingQuery per registered view.

    ``sync()`` reconciles running queries with the ``views`` table —
    the T8 (start on insert), T9 (restart/stop on update) and T10 (stop on
    delete) trigger semantics in one idempotent pass.
    """

    def __init__(
        self,
        store: EventStore,
        post=http_post,
        batch_limit: int = 1,
        max_parallel_posts: int = 8,
    ):
        self.store = store
        self.post = post
        # stream_events(view, 1) per tick, mirroring extensions.sql:40-42.
        self.batch_limit = batch_limit
        # ASYNC transport, matching pg_net's background-worker semantics
        # (/root/reference/extensions.sql:44-47): POSTs are submitted to a
        # bounded pool and the tick returns immediately — one slow or dead
        # endpoint can neither stall the delivery tick nor block other
        # partitions' sends.  A failed/hung POST is simply never acked, so
        # lease expiry redelivers (the same recovery pg_net relies on).
        self._max_parallel_posts = max_parallel_posts
        self._pool = ThreadPoolExecutor(
            max_workers=max_parallel_posts, thread_name_prefix="push-post"
        )
        self._pool_closed = False
        self._queries: dict[str, StreamingQuery] = {}

    # ------------------------------------------------------------------ #

    def start(self, view: str) -> StreamingQuery:
        """T8: start the named push query for a view with a non-null
        pooling_delay_s (/root/reference/extensions.sql:61-81)."""
        cfg = self.store.views().filter(F.col("view") == view).collect()
        if not cfg:
            raise ValueError(f"view {view!r} is not registered")
        row = cfg[0]
        delay = row["pooling_delay_s"]
        url = row["edge_function_url"]
        if delay is None:
            raise ValueError(f"view {view!r} has no pooling_delay_s (client-pull view)")
        if view in self._queries:
            self.stop(view)
        if self._pool_closed:  # restarted after stop_all → fresh pool
            self._pool = ThreadPoolExecutor(
                max_workers=self._max_parallel_posts, thread_name_prefix="push-post"
            )
            self._pool_closed = False

        store, post, limit = self.store, self.post, self.batch_limit

        pool = self._pool

        def send(payload: dict) -> None:
            try:
                post(url, payload)
            except Exception:  # noqa: BLE001 — no ack ⇒ lease-expiry retry
                pass

        def deliver(_batch_df, _batch_id) -> None:
            # The tick payload is ignored; the claim runs on the store's
            # current snapshot (extensions.sql:40-42: stream_events LIMIT 1).
            events = store.stream_events(view, limit=limit).collect()
            for ev in events:
                pool.submit(
                    send,
                    {
                        # jsonb_build_object shape, extensions.sql:46
                        "view": view,
                        "decider_id": ev["decider_id"],
                        "offset": ev["offset"],
                        "data": ev["data"],
                    },
                )

        q = (
            self.store.spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
            .writeStream.queryName(view)
            .trigger(processingTime=f"{int(delay)} seconds")
            .foreachBatch(deliver)
            .start()
        )
        self._queries[view] = q
        return q

    def stop(self, view: str) -> None:
        """T10 / cron.unschedule analogue
        (/root/reference/extensions.sql:113-126)."""
        q = self._queries.pop(view, None)
        if q is not None:
            q.stop()

    def sync(self) -> dict[str, str]:
        """T8+T9+T10 in one reconciliation pass: start queries for push
        views, stop queries whose view was deleted or switched to pull."""
        actions: dict[str, str] = {}
        push_views = {
            r["view"]
            for r in self.store.views()
            .filter("pooling_delay_s IS NOT NULL")
            .select("view")
            .collect()
        }
        for view in list(self._queries):
            if view not in push_views:
                self.stop(view)
                actions[view] = "stopped"
        for view in push_views:
            if view not in self._queries or not self._queries[view].isActive:
                self.start(view)
                actions[view] = "started"
        return actions

    def stop_all(self) -> None:
        for view in list(self._queries):
            self.stop(view)
        self._pool.shutdown(wait=False, cancel_futures=True)
        self._pool_closed = True
