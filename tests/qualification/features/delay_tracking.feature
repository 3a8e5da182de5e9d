Feature: Delay tracking
    The delay-compensation chain must remove a known geometric delay:
    coarse (integer-sample) alignment, fractional-sample fine delay with
    band-centre-referenced phase ramp, and fringe-stopping phase
    (the struct delay_vals contract, BeamformerParameters.h:61-66;
    rotation convention coeff_generator.py:55-65), and the steering
    solution must extrapolate in time via the delay/phase rates
    (grouped-timestamps extrapolation, BeamformerKernels.cu:153-166).

    Scenario: a delayed antenna is realigned by the delay chain
        Given two antennas whose second element sees the sky 3.25 samples late
        When the F-engine corrects the coarse and fractional delay with fringe stopping
        Then the two antennas' channelised voltages agree in phase at the tone channel
        And the coherent beam sum recovers the aligned power

    Scenario: an uncorrected delay decorrelates the beam
        Given two antennas whose second element sees the sky 3.25 samples late
        When the F-engine applies no delay correction
        Then the beam power is measurably below the aligned power

    Scenario: delay-rate extrapolation tracks a moving source
        Given a steering solution with a non-zero delay rate
        When the solution is extrapolated 5 seconds past its epoch
        Then the extrapolated steering planes equal a solution computed at that instant
