Feature: Control-plane aggregation
    The aggregating servlet must fan CAM requests out to every engine
    node, mirror every downstream sensor under a nodeN prefix, and
    surface node degradation to the operator — the Corr3Servlet
    contract (corr3_servlet.py:112-153, SensorMirror :14-64).

    Scenario: beam weights fan out to the whole fleet
        Given a servlet fronting three engine nodes
        When the operator sets beam weights
        Then every node receives the same weights

    Scenario: downstream sensors mirror with node prefixes
        Given a servlet fronting three engine nodes
        When a node's device-status sensor changes
        Then the servlet republishes it as nodeN.device-status

    Scenario: a failing node surfaces to the operator
        Given a servlet fronting three engine nodes with one failing
        When the operator sets beam weights
        Then the request fails with the node's error
