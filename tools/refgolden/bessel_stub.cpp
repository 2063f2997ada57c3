/* Drop-in replacement for GSL's gsl_sf_bessel_Inu used by the reference's
 * spreading-ring initial condition (reference src/init.cpp:379,397) when
 * building the golden-output binary without GSL.
 *
 * Modified Bessel function of the first kind I_nu(z) for small fractional
 * order (the reference only calls nu = 0.25) and z >= 0, to full double
 * precision: power series for z <= 30, Hankel asymptotic expansion beyond.
 * Original implementation (standard textbook formulas, Abramowitz & Stegun
 * 9.6.10 and 9.7.1).
 */
#include <cmath>

double gsl_sf_bessel_Inu(double nu, double z);

double gsl_sf_bessel_Inu(double nu, double z)
{
    if (z == 0.0)
	return nu == 0.0 ? 1.0 : 0.0;

    if (z <= 30.0) {
	/* I_nu(z) = (z/2)^nu * sum_k (z^2/4)^k / (k! * Gamma(nu+k+1)) */
	const double q = 0.25 * z * z;
	double term = std::exp(nu * std::log(0.5 * z) - std::lgamma(nu + 1.0));
	double sum = term;
	for (int k = 1; k < 200; ++k) {
	    term *= q / (k * (nu + k));
	    sum += term;
	    if (term < 1e-18 * sum)
		break;
	}
	return sum;
    }

    /* I_nu(z) ~ e^z / sqrt(2 pi z) * sum_k (-1)^k a_k(nu) / z^k,
     * a_k(nu) = prod_{j=1..k} (4 nu^2 - (2j-1)^2) / (8 j) */
    const double mu = 4.0 * nu * nu;
    double term = 1.0, sum = 1.0;
    for (int k = 1; k < 30; ++k) {
	const double tj = 2.0 * k - 1.0;
	term *= -(mu - tj * tj) / (8.0 * k * z);
	if (std::abs(term) < 1e-18)
	    break;
	sum += term;
    }
    return std::exp(z) / std::sqrt(2.0 * M_PI * z) * sum;
}
