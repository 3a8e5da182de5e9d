Feature: Beam steering
    The B-engine must point: steering coefficients generated from delay
    polynomials (coeff_generator.py:55-65) must coherently sum a source
    arriving with per-antenna geometric delays, attenuate it when the
    beam points elsewhere, and fold CAM-supplied per-antenna weights
    into the sum (the ?beam-weights contract, corr3_servlet.py:140-153).

    Scenario: a beam steered at the source recovers the array gain
        Given a 4-antenna array observing a tone with per-antenna phase gradients
        When one beam is steered at the source and one beam away from it
        Then the on-source beam recovers the coherent array gain
        And the off-source beam is at least 20 dB down

    Scenario: per-antenna weights scale the beam
        Given a steered beam with one antenna weighted to zero
        When the weighted beam is formed
        Then the beam amplitude equals the (n_ants - 1) partial sum
