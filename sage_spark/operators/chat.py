"""Chat/conversation graph model (reference app/chat_store.py).

Closes SURVEY.md's chat-scope carve-out: the Conversation dimension, the
PARTICIPATES_IN / MEMBER_OF / IN_CONVERSATION / SENT_BY edges, and the
two-hop message-access check (J9) — re-expressed as DataFrame programs over
the message log instead of per-row Cypher MERGEs.

Semantics anchors:
* stable conversation ids — chat_store.py:42-52 (direct:min:max, group:<id>,
  sage:<user>);
* conversation upsert + PARTICIPATES_IN — chat_store.py:236-297;
* message node + IN_CONVERSATION / SENT_BY — chat_store.py:514-541;
* access check (user -PARTICIPATES_IN-> conv <-IN_CONVERSATION- message) —
  backend.py:564-574.

Scale notes: every derivation is one distinct/groupBy keyed on short id
columns; the access check is a broadcast semi-join of the (small) user's
conversation set against the message log — no message-side shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stable_conversation_id_col(
    conversation_type=F.col("conversation_type"),
    sender=F.col("sender_id"),
    receiver=None,
    group_id=F.col("group_id"),
):
    """Column form of chat_store.py:42-52: the conversation id is a pure
    function of the endpoints, so any executor derives it without lookups."""
    receiver = F.col("receiver_id") if receiver is None else receiver
    return (
        F.when(
            conversation_type == "direct",
            F.concat_ws(":", F.lit("direct"), F.least(sender, receiver), F.greatest(sender, receiver)),
        )
        .when(conversation_type == "group", F.concat_ws(":", F.lit("group"), group_id))
        # sage thread id is keyed on the HUMAN (chat_store.py:46-47,
        # SAGE_USER_ID='sage'): bot-sent rows key on their receiver
        .when(
            conversation_type == "sage",
            F.concat_ws(":", F.lit("sage"), F.when(sender == "sage", receiver).otherwise(sender)),
        )
    )


def messages_from_webtext(webtext: DataFrame) -> DataFrame:
    """Message-node projection of the ingest log (chat_store.py:514-537
    without the chat-app payload columns), with the conversation id re-derived
    from the endpoints and verified against the logged one."""
    receiver = F.col("receiver_ids")[0]
    derived = stable_conversation_id_col(receiver=receiver)
    return webtext.select(
        F.col("message_id"),
        F.coalesce(F.col("conversation_id"), derived).alias("conversation_id"),
        derived.alias("derived_conversation_id"),
        F.col("conversation_type"),
        F.col("sender_id"),
        receiver.alias("receiver_id"),
        F.col("group_id"),
        F.col("receiver_ids"),
        F.col("warc_ts").cast("string").alias("sent_at"),
        F.col("source"),
    )


def conversations(messages: DataFrame) -> DataFrame:
    """Conversation dimension: one row per conversation with type, group and
    activity bounds (the SET c.updated_at = $sent_at fold of the reference)."""
    return messages.groupBy("conversation_id").agg(
        F.min_by("conversation_type", "sent_at").alias("conversation_type"),
        F.min_by("group_id", "sent_at").alias("group_id"),
        F.count("*").alias("n_messages"),
        F.max("sent_at").alias("updated_at"),
    )


def memberships(messages: DataFrame) -> DataFrame:
    """MEMBER_OF edges (person, group) observed from group traffic — the
    batch analog of chat_store.py:222-233's memberIds merge."""
    grp = messages.filter(F.col("conversation_type") == "group")
    people = grp.select(F.col("group_id"), F.col("sender_id").alias("person_id")).unionByName(
        grp.select(F.col("group_id"), F.explode("receiver_ids").alias("person_id"))
    )
    return people.dropDuplicates(["person_id", "group_id"]).select("person_id", "group_id")


def participations(messages: DataFrame) -> DataFrame:
    """PARTICIPATES_IN edges (person, conversation): direct conversations get
    both endpoints; group conversations get every observed member
    (chat_store.py:236-297)."""
    # sage conversations are two-party like direct ones: the user and the
    # assistant bot both participate (chat_store.py:257-283)
    direct = messages.filter(F.col("conversation_type").isin("direct", "sage"))
    direct_edges = direct.select(F.col("sender_id").alias("person_id"), "conversation_id").unionByName(
        direct.select(F.col("receiver_id").alias("person_id"), "conversation_id")
    ).filter(F.col("person_id").isNotNull())
    grp = messages.filter(F.col("conversation_type") == "group")
    group_convs = grp.select("group_id", "conversation_id").dropDuplicates()
    group_edges = memberships(messages).join(group_convs, "group_id").select("person_id", "conversation_id")
    return direct_edges.unionByName(group_edges).dropDuplicates(["person_id", "conversation_id"])


def read_edges(
    messages: DataFrame,
    *,
    parts: DataFrame | None = None,
    mark_recipient_read: bool = False,
) -> DataFrame:
    """HAS_READ edges (person_id, message_id, read_at) — chat_store.py:589-609:
    the sender always reads their own message at sent_at; with
    ``mark_recipient_read`` every other participant of the message's
    conversation gets an edge too (the reference's member loop, batched as
    one join against PARTICIPATES_IN)."""
    sender_reads = messages.select(
        F.col("sender_id").alias("person_id"),
        "message_id",
        F.col("sent_at").alias("read_at"),
    )
    if not mark_recipient_read:
        return sender_reads.dropDuplicates(["person_id", "message_id"])
    if parts is None:
        raise ValueError("mark_recipient_read requires the participations edges")
    member_reads = (
        messages.select("message_id", "conversation_id", "sender_id", F.col("sent_at").alias("read_at"))
        .join(parts, "conversation_id")
        .filter(F.col("person_id") != F.col("sender_id"))
        .select("person_id", "message_id", "read_at")
    )
    return sender_reads.unionByName(member_reads).dropDuplicates(["person_id", "message_id"])


def unread_counts(
    messages: DataFrame, parts: DataFrame, reads: DataFrame, user_id: str
) -> DataFrame:
    """Per-conversation unread tally for one user (chat_store.py:1039-1046):
    messages in the user's conversations, sent by others, with no HAS_READ
    edge from the user; conversations with nothing unread report 0 (the
    reference's OPTIONAL MATCH). The user's conversation set and read set
    are user-sized — both broadcast; the message log never shuffles."""
    user_convs = parts.filter(F.col("person_id") == user_id).select("conversation_id").distinct()
    user_reads = reads.filter(F.col("person_id") == user_id).select("message_id")
    unread = (
        messages.join(F.broadcast(user_convs), "conversation_id", "left_semi")
        .filter(F.col("sender_id") != user_id)
        .join(F.broadcast(user_reads), "message_id", "left_anti")
    )
    counts = unread.groupBy("conversation_id").agg(
        F.count_distinct("message_id").alias("unread_count")
    )
    return user_convs.join(counts, "conversation_id", "left").select(
        "conversation_id",
        F.coalesce(F.col("unread_count"), F.lit(0)).cast("long").alias("unread_count"),
    )


def message_access(messages: DataFrame, parts: DataFrame, user_id: str) -> DataFrame:
    """J9 (backend.py:564-574): the two-hop
    user -PARTICIPATES_IN-> conversation <-IN_CONVERSATION- message
    as a broadcast semi-join — the user's conversation set is tiny, the
    message log is the 100 TB side and never shuffles."""
    user_convs = parts.filter(F.col("person_id") == user_id).select("conversation_id")
    return messages.join(F.broadcast(user_convs), "conversation_id", "left_semi")
