package KmerGutsClient;

# JSON-RPC client for the KmerGuts TPU annotation service.
#
# Counterpart of the reference's generated Perl client
# (lib/KmerGutsJava/KmerGutsJavaClient.pm, which exposes only status because
# the KIDL module is empty). Core-module-only (HTTP::Tiny + JSON::PP), and
# also drives the real `annotate` method.
#
# Usage:
#   my $c = KmerGutsClient->new("http://host:5000");
#   my $st = $c->status();
#   my $report = $c->annotate({fasta => ">P1\nACDEF...\n", aa => 1});

use strict;
use warnings;
use HTTP::Tiny;
use JSON::PP;

sub new {
    my ($class, $url, %opts) = @_;
    my $self = {
        url  => $url,
        http => HTTP::Tiny->new(timeout => $opts{timeout} // 600),
        json => JSON::PP->new->utf8->allow_nonref,
        id   => 0,
    };
    return bless $self, $class;
}

sub _call {
    my ($self, $method, $params) = @_;
    my $payload = $self->{json}->encode({
        version => "1.1",
        method  => "KmerGutsJava.$method",
        params  => $params,
        id      => ++$self->{id} . "",
    });
    my $res = $self->{http}->post($self->{url}, {
        content => $payload,
        headers => {"Content-Type" => "application/json"},
    });
    die "transport error: $res->{status} $res->{reason}\n"
        unless $res->{content};
    my $body = $self->{json}->decode($res->{content});
    if ($body->{error}) {
        my $e = $body->{error};
        die sprintf("%s (%s): %s\n", $e->{name} // "JSONRPCError",
                    $e->{code} // -32000, $e->{message} // "");
    }
    return $body->{result};
}

sub status {
    my ($self) = @_;
    return $self->_call("status", [])->[0];
}

sub warm {
    my ($self) = @_;
    return $self->_call("warm", [])->[0];
}

# $opts: {fasta => ..., aa => 1, min_hits => ..., ...} -> report text
sub annotate {
    my ($self, $opts) = @_;
    # JSON booleans for flag-ish fields
    for my $k (qw(aa order_constraint debug)) {
        $opts->{$k} = $opts->{$k} ? JSON::PP::true : JSON::PP::false
            if exists $opts->{$k};
    }
    return $self->_call("annotate", [$opts])->[0]{report};
}

1;
