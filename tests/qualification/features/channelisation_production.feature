Feature: Channelisation of the production fused kernel
    The leakage requirement must hold for the F-engine path that
    actually ships: the fused Pallas kernel with bf16 DFT operands
    (FBEngine's resolved default), not only the portable XLA float
    chain. Measured on the kernel's unquantised (f32) output so the
    int8 transport floor cannot mask the filterbank's own response.
    (Requirement mirrored from the reference acceptance spec,
    bdd_experiment/test/features/channelisation.feature:5-9.)

    Scenario: CW tone through the fused bf16 production kernel
        Given the production fused F kernel with 512 channels and a 16-tap PFB
        When a CW tone at the centre of channel 100 is channelised without requantisation
        Then the peak response lands in channel 100
        And the response in every other channel is at least 62 dB down

    Scenario: bf16 rounding does not lift the leakage floor
        Given the production fused F kernel with 512 channels and a 16-tap PFB
        When the same tone is channelised with exact f32 DFT operands
        Then the bf16 path's worst leakage is within 6 dB of the f32 path's
