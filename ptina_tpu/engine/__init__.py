'''
Integrators ("engines"): path (MIS), brute, preview (AOV), mlt.

Each engine is a pure function film' = render(scene, film, sample_index)
(plus extra chain state for MLT), replacing the reference's stateful
singleton engines (ptina/engine/).
'''
