Feature: Failure detection and containment
    An engine node must detect data-plane faults, surface them through
    its health sensors, and keep processing — the sensor-based health
    model of the reference control plane (corr3_servlet.py:45-64,
    fake_node.py:56-61) with the drop-accounting contract of the
    data plane (SURVEY.md §5.3).

    Scenario: a failing pipeline step degrades but does not kill the node
        Given a running engine node
        When a malformed chunk makes a pipeline step raise
        Then the node's device-status sensor reports degraded
        And subsequent valid chunks are still processed

    Scenario: input sequence gaps raise the lost-chunk sensor
        Given a running engine node
        When chunks arrive with a sequence gap
        Then the input-lost sensor counts the missing chunks

    Scenario: malformed chunks are contained and accounted
        Given a running engine node
        When a wrong-sized chunk is submitted
        Then it is rejected with the malformed counter raised
        And the ingest thread keeps feeding subsequent valid chunks
