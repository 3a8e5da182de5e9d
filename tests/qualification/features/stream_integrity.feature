Feature: Stream integrity
    The transport must deliver heaps bit-exactly, account for every
    loss, and tolerate reordering — the reference's offline
    pattern-verification and sequence-gap disciplines
    (dpdk_send_recv/verify.py:20-33; ibverbs_rx.c:303-319).

    Scenario: deterministic payload pattern survives the transport
        Given a chunk filled with the deterministic payload pattern
        When it is packetized and reassembled
        Then the pattern checker reports zero mismatching words

    Scenario: packet loss is detected and accounted
        Given a stream of heaps with one packet dropped in flight
        When the stream is reassembled
        Then the incomplete heap is evicted and counted
        And the consumer's sequence accounting reports the gap

    Scenario: reordered packets reassemble bit-exactly
        Given a heap whose packets arrive in reverse order
        When the stream is reassembled
        Then the delivered payload is bit-identical
