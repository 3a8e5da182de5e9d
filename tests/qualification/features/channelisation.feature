Feature: Channelisation
    The F-engine channeliser must place a CW tone in the correct channel
    and keep out-of-channel leakage within the qualification bound.
    (Requirement mirrored from the reference acceptance spec,
    bdd_experiment/test/features/channelisation.feature:1-9.)

    Scenario: CW tone at a channel centre
        Given an F-engine configured with 128 channels and a 16-tap PFB
        When a full-scale CW tone at the centre of channel 37 is channelised
        Then the peak response lands in channel 37
        And the response in every other channel is at least 62 dB down

    Scenario: CW tone swept across channel centres
        Given an F-engine configured with 128 channels and a 16-tap PFB
        When tones at several channel centres are channelised
        Then each peak lands in its own channel
