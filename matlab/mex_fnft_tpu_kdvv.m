% MEX_FNFT_TPU_KDVV Fast nonlinear Fourier transform for the Korteweg-de
% Vries equation with vanishing boundary conditions.
%
%   contspec = MEX_FNFT_TPU_KDVV(q, T, XI)
%   [contspec, bound_states] = MEX_FNFT_TPU_KDVV(q, T, XI, OPTIONAL INPUTS)
%
% DESCRIPTION
%   Interface to fnft_tpu_kdvv in libfnft_tpu.so. Protocol compatible with
%   the reference FNFT library's mex_fnft_kdvv; the second output and the
%   option strings are fnft-tpu extensions (the reference library has KdV
%   bound states "not yet implemented").
%
% INPUTS
%   q               Complex row vector of D samples; pass complex(q)
%   T               Real 1x2 vector [T0 T1]
%   XI              Real 1x2 vector, bounds of the spectral grid
%
% OPTIONAL INPUTS
%   'M', m                 Number of contspec samples (default D)
%   'discr_2split4B' etc.  Discretization (see MEX_FNFT_TPU_NSEV)
%   'quiet'                Suppress warnings
%
% OUTPUTS
%   contspec        1xM complex row vector, reflection coefficient
%   bound_states    1xK complex row vector (fnft-tpu extension)
